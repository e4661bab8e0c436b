"""deathmetal_datalake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference lakehouse ``samuel-aka-viana/deathmetal-datalake`` (medallion
CSV→bronze→silver→gold flows over albums/bands/reviews; see SURVEY.md),
re-expressed Spark-first:

- every relational operator compiles to built-in Catalyst expressions
  (zero row-level Python UDFs in the parity surface — SURVEY.md §2.8);
- storage is directory-per-table snappy Parquet (not the reference's
  single-object-per-table layout, which serializes parallelism);
- streaming ingest is Structured Streaming (replacing the reference's
  Kinesis/Firehose chunk pipeline, ``flows/landing.py:27-53``);
- large-scale training-data extensions (dedup, similarity search, text
  analysis) are layered on the same DataFrame core.
"""

from deathmetal_datalake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

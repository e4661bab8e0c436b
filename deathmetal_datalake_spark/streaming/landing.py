"""Structured Streaming ingest: landing CSV chunks → bronze Parquet.

Replaces the reference's Kinesis→Firehose micro-batch pipeline
(``flows/landing.py:27-53``, ``infra/main.tf:47-124``) with a single
Spark streaming query per dataset:

- per-entity landing subdirectory ≈ per-entity Kinesis stream
  (``infra/main.tf:47-60``; partition key at ``flows/landing.py:45``);
- ``processingTime`` trigger ≈ Firehose's 60 s buffer
  (``infra/main.tf:79-80``); ``availableNow`` = batch replay, replacing
  the reference's ``wait_firehose`` polling loop
  (``flows/landing.py:56-66``) with checkpointed exactly-once progress;
- PERMISSIVE mode + ``_corrupt_record`` column ≈ the Firehose error
  prefix (``infra/main.tf:82``): corrupt rows are diverted to an
  errors/ sink rather than dropped.

A chunked producer (``chunk_csv``) mirrors the reference's 900 KB
header-re-attaching splitter (``flows/landing.py:27-53``) to generate
realistic landing input for tests.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

_MAX_BYTES = 900 * 1024  # `flows/landing.py:28`


def chunk_csv(csv_path: str, out_dir: str, max_bytes: int = _MAX_BYTES) -> list[str]:
    """Split a CSV into ≤max_bytes chunks, re-prepending the header to
    every chunk (`flows/landing.py:37-47`), written as
    ``{out_dir}/{stem}_{part}.csv`` (`flows_iceberg/landing_iceberg.py:50`)."""
    src = Path(csv_path)
    lines = src.read_text().splitlines(keepends=True)
    header, rows = lines[0], lines[1:]
    os.makedirs(out_dir, exist_ok=True)
    chunks: list[str] = []
    buf: list[str] = [header]
    size = len(header.encode())
    part = 0

    def flush() -> None:
        nonlocal buf, size, part
        if len(buf) > 1:
            dest = Path(out_dir) / f"{src.stem}_{part:05d}.csv"
            dest.write_text("".join(buf))
            chunks.append(str(dest))
            part += 1
        buf = [header]
        size = len(header.encode())

    for row in rows:
        rb = len(row.encode())
        if size + rb > max_bytes:
            flush()
        buf.append(row)
        size += rb
    flush()
    return chunks


def _publish_batch(batch_df, dest_dir: str, batch_id: int, fmt: str = "parquet") -> None:
    """Idempotent foreachBatch publish — the piece that upgrades
    foreachBatch's at-least-once contract to exactly-once.

    A replayed batch (the query failed after a partial sink write and
    restarted from the checkpoint) re-executes with the SAME batch_id
    over the SAME source offsets, so idempotence per batch_id is
    sufficient: files are staged to a scratch dir, ``os.replace``d to
    deterministic batch-derived names (a replay overwrites the same
    names, never duplicates), and a ``_batch-<id>.done`` marker makes
    the whole publish a no-op once it exists. Stale files from a prior
    partial attempt are cleared before the rename pass, so even a retry
    that plans a different file count cannot leave extras behind.
    Published files live FLAT in ``dest_dir`` (no per-batch subdirs),
    so plain ``spark.read.parquet(dest_dir)`` needs no recursive-lookup
    options and sees no synthetic partition column."""
    import glob
    import shutil

    os.makedirs(dest_dir, exist_ok=True)
    marker = os.path.join(dest_dir, f"_batch-{batch_id:010d}.done")
    if os.path.exists(marker):
        return
    stage = os.path.join(dest_dir, f"_stage-{batch_id:010d}")
    writer = batch_df.write.mode("overwrite")
    if fmt == "parquet":
        writer.option("compression", "snappy").parquet(stage)
    else:
        writer.json(stage)
    for stale in glob.glob(os.path.join(dest_dir, f"batch-{batch_id:010d}-*")):
        os.remove(stale)
    parts = sorted(
        name
        for name in os.listdir(stage)
        if name.startswith("part-") and not name.endswith(".crc")
    )
    for i, name in enumerate(parts):
        ext = name[name.find(".") :]  # ".snappy.parquet" / ".json"
        os.replace(
            os.path.join(stage, name),
            os.path.join(dest_dir, f"batch-{batch_id:010d}-{i:04d}{ext}"),
        )
    shutil.rmtree(stage, ignore_errors=True)
    with open(marker, "w"):
        pass


def _string_schema(columns: list[str]) -> StructType:
    """Streaming CSV sources require a declared schema; ingest as
    all-strings (typing happens at silver, matching the reference where
    landing is raw text — `flows/landing.py:37-49`)."""
    return StructType([StructField(c, StringType(), True) for c in columns])


def stream_landing_to_bronze(
    spark: SparkSession,
    landing_dir: str,
    bronze_dir: str,
    dataset: str,
    columns: list[str],
    checkpoint_dir: str,
    errors_dir: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """One micro-batch query: landing/{dataset}/*.csv → bronze parquet.

    ``trigger`` defaults to ``{"availableNow": True}`` (drain everything
    then stop — the test/replay mode); pass
    ``{"processingTime": "60 seconds"}`` for the Firehose-equivalent
    continuous mode.
    """
    schema = _string_schema(columns).add("_corrupt_record", StringType())
    src = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(os.path.join(landing_dir, dataset))
    )
    good = src.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    if errors_dir is not None:
        # Error channel analog of the Firehose error prefix. Kept in the
        # same stream via foreachBatch so one checkpoint covers both;
        # each write is idempotent per batch_id (_publish_batch), so the
        # path matches the native sink's exactly-once contract even
        # though foreachBatch itself is at-least-once.
        def _sink(batch_df, batch_id: int) -> None:
            _publish_batch(
                batch_df.filter(F.col("_corrupt_record").isNull()).drop(
                    "_corrupt_record"
                ),
                os.path.join(bronze_dir, dataset),
                batch_id,
            )
            bad = batch_df.filter(F.col("_corrupt_record").isNotNull())
            if not bad.isEmpty():
                _publish_batch(
                    bad.select("_corrupt_record"),
                    os.path.join(errors_dir, dataset),
                    batch_id,
                    fmt="json",
                )

        writer = src.writeStream.foreachBatch(_sink).option(
            "checkpointLocation", checkpoint_dir
        )
    else:
        writer = (
            good.writeStream.format("parquet")
            .option("path", os.path.join(bronze_dir, dataset))
            .option("checkpointLocation", checkpoint_dir)
            .option("compression", "snappy")
        )
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def stream_rate_to_bronze(
    spark: SparkSession,
    bronze_dir: str,
    dataset: str,
    checkpoint_dir: str,
    rows_per_second: int = 100,
) -> StreamingQuery:
    """Record-stream transport analog of the Kinesis ``put_record`` path
    (``flows/landing.py:27-53`` + ``infra/main.tf:47-60``): a continuous
    record source rather than landed files.

    Spark's ``rate`` source is the standard stand-in for a record
    transport in environments without a broker — it produces
    ``(timestamp, value)`` at a controlled rate on the executors, which
    we shape into the landing record envelope (monotonic record id,
    deterministic partition key, payload) and deliver to the same
    checkpointed bronze parquet sink the file path uses. Swapping in a
    real transport (Kafka/Kinesis connector) changes only ``readStream``
    options, not the sink contract.
    """
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    records = src.select(
        F.col("value").alias("record_id"),
        F.col("timestamp").alias("arrival_ts"),
        # Deterministic partition-key analog of flows/landing.py:45.
        F.pmod(F.col("value"), F.lit(8)).cast("string").alias("partition_key"),
        F.concat(F.lit(f"{dataset}-payload-"), F.col("value")).alias("payload"),
    )
    return (
        records.writeStream.format("parquet")
        .option("path", os.path.join(bronze_dir, dataset))
        .option("checkpointLocation", checkpoint_dir)
        .option("compression", "snappy")
        .trigger(processingTime="1 second")
        .start()
    )


def stream_records_to_bronze(
    spark: SparkSession,
    stream_dir: str,
    columns: list[str],
    bronze_dir: str,
    checkpoint_dir: str,
    errors_dir: str | None = None,
    available_now: bool = True,
    trigger_seconds: int = 60,
) -> StreamingQuery:
    """Chunked-CSV records from the RECORD TRANSPORT → bronze parquet:
    the reference's full ingest edge (producer `put_record` of 900 KB
    header-re-attached CSV chunks, `flows/landing.py:27-53`, delivered
    by micro-batch, `infra/main.tf:66-124`) as ONE streaming query over
    the ``record_feed`` source.

    Each record payload is a standalone CSV chunk; the query strips the
    re-attached header POSITIONALLY (always line 1 of a chunk — a data
    row whose text happens to equal the header survives), explodes the
    remaining lines, parses columns with ``from_csv`` in PERMISSIVE
    mode, and appends to a checkpointed bronze sink — exactly-once
    across restarts, no polling loop. Unparseable lines go to
    ``errors_dir`` (the Firehose error-prefix analog, same channel as
    ``stream_landing_to_bronze``) when given, else are dropped.
    All transformations are built-in expressions: the chunk unpacking
    runs inside whole-stage codegen, so at scale the cost is the scan.
    """
    from deathmetal_datalake_spark.streaming.transport import (
        RECORD_FEED_SCHEMA,
        register_record_feed,
    )

    register_record_feed(spark)
    raw = (
        spark.readStream.format("record_feed")
        .schema(RECORD_FEED_SCHEMA)
        .option("path", stream_dir)
        .load()
    )
    ddl = ", ".join(f"`{c}` STRING" for c in columns) + ", `_corrupt_record` STRING"
    lines = F.split(F.col("data"), "\n")
    body = F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))
    parsed = (
        raw.select(F.explode(body).alias("line"))
        .filter(F.length("line") > 0)
        .select(
            "line",
            F.from_csv(
                F.col("line"),
                ddl,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("r"),
        )
    )
    good = (
        parsed.filter(F.col("r._corrupt_record").isNull())
        .select("r.*")
        .drop("_corrupt_record")
    )
    if errors_dir is not None:

        def _sink(batch_df, batch_id: int) -> None:
            # Idempotent per batch_id: foreachBatch replays a failed
            # batch on restart, so a plain append would duplicate rows.
            _publish_batch(
                batch_df.filter(F.col("r._corrupt_record").isNull())
                .select("r.*")
                .drop("_corrupt_record"),
                bronze_dir,
                batch_id,
            )
            bad = batch_df.filter(F.col("r._corrupt_record").isNotNull())
            if not bad.isEmpty():
                _publish_batch(bad.select("line"), errors_dir, batch_id, fmt="json")

        writer = parsed.writeStream.foreachBatch(_sink).option(
            "checkpointLocation", checkpoint_dir
        )
    else:
        writer = (
            good.writeStream.format("parquet")
            .option("path", bronze_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

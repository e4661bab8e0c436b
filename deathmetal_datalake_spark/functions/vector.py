"""Vectorized (Arrow/pandas) vector math — the sanctioned slow path.

The engine's parity surface uses zero Python UDFs (SURVEY.md §2.8); this
module exists for extension operators where Python is unavoidable and
demonstrates the right way to cross the boundary: ``@pandas_udf`` over
Arrow batches (columns arrive as numpy-backed pandas Series, ~10-100×
faster than row-at-a-time UDFs). The catalog registers a pandas-UDF
variant of cosine top-k checked against the same DuckDB oracle as the
built-in-expression variant — proving the two paths agree bit-for-bit
after rounding.

Fold-order note: the JVM (``F.aggregate``) and DuckDB
(``list_dot_product``) both accumulate left-to-right over vector
components, and float addition is not associative, so ``np.dot`` (which
sums pairwise) can differ in the last ulp and flip a rounded digit. The
kernel below is vectorized across the *rows* of the batch while keeping
the component loop sequential — each row's accumulation order is
exactly the left fold, at numpy speed.

The UDF body is deliberately self-contained (helpers nested, return
type as a ``DataType`` object): executors deserialize the function
without importing this module, so no Spark context is needed at
unpickle time.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine similarity between two array<double> columns."""
    import numpy as np

    if len(a) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
    B = np.stack([np.asarray(y, dtype=np.float64) for y in b])
    # Vectorized across rows, sequential over components — each row's
    # accumulation order is exactly the left fold.
    n = A.shape[0]
    dot = np.zeros(n, dtype=np.float64)
    nx = np.zeros(n, dtype=np.float64)
    ny = np.zeros(n, dtype=np.float64)
    for i in range(A.shape[1]):
        ai = A[:, i]
        bi = B[:, i]
        dot += ai * bi
        nx += ai * ai
        ny += bi * bi
    return pd.Series(dot / (np.sqrt(nx) * np.sqrt(ny)))

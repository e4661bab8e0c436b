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
    # Guard before np.stack: a NULL vector or mixed dimensions inside one
    # Arrow batch would otherwise surface as an opaque numpy ValueError
    # from stack(). NULLs propagate per-row (scalar fallback); a genuine
    # dimension mismatch between the two sides raises a clear error.
    dims_a = {len(x) for x in a if x is not None}
    dims_b = {len(y) for y in b if y is not None}
    if any(x is None for x in a) or any(y is None for y in b) or len(dims_a) > 1 or len(dims_b) > 1:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            if len(x) != len(y):
                raise ValueError(
                    f"cosine_sim: dimension mismatch {len(x)} vs {len(y)}"
                )
            dot = nx = ny = 0.0
            for xi, yi in zip(x, y):
                dot += xi * yi
                nx += xi * xi
                ny += yi * yi
            out.append(dot / ((nx ** 0.5) * (ny ** 0.5)))
        # Nullable dtype: None rows must reach Spark as NULL, not NaN.
        return pd.Series(out, dtype="Float64")
    if dims_a != dims_b:
        raise ValueError(f"cosine_sim: dimension mismatch {dims_a} vs {dims_b}")
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

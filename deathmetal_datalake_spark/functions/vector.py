"""Vectorized (Arrow/pandas) vector math — the sanctioned slow path.

The engine's parity surface uses zero Python UDFs (SURVEY.md §2.8); this
module exists for extension operators where Python is unavoidable and
demonstrates the right way to cross the boundary: ``@pandas_udf`` over
Arrow batches (columns arrive as numpy-backed pandas Series, ~10-100×
faster than row-at-a-time UDFs). The catalog registers a pandas-UDF
variant of cosine top-k checked against the same DuckDB oracle as the
built-in-expression variant — proving the two paths agree bit-for-bit
after rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine similarity between two array<double> columns."""
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        xv = np.asarray(x, dtype=np.float64)
        yv = np.asarray(y, dtype=np.float64)
        # Sequential sums (not np.dot) to match the JVM/DuckDB left-fold
        # accumulation order — keeps all three implementations exactly
        # equal before rounding.
        dot = 0.0
        nx = 0.0
        ny = 0.0
        for xi, yi in zip(xv, yv):
            dot += xi * yi
            nx += xi * xi
            ny += yi * yi
        out[i] = dot / (np.sqrt(nx) * np.sqrt(ny))
    return pd.Series(out)

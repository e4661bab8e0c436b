"""Column-name normalization (operator P1, SURVEY.md §2.2).

Reference semantics (``flows/bronze.py:30-40``): strip surrounding
whitespace, lowercase, spaces→underscores, then de-duplicate collisions
by suffixing ``_2``, ``_3``, ... in order of appearance. The rename is
driver-side metadata only — a zero-cost ``toDF`` in Spark, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    return name.strip().lower().replace(" ", "_")


def normalize_and_dedupe(names: list[str]) -> list[str]:
    """Pure-python name pass, exposed separately for property tests."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for raw in names:
        base = normalize_name(raw)
        count = seen.get(base, 0) + 1
        seen[base] = count
        out.append(base if count == 1 else f"{base}_{count}")
    return out


def normalize_column_names(df: DataFrame) -> DataFrame:
    return df.toDF(*normalize_and_dedupe(list(df.columns)))

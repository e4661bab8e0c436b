"""Typing / cleansing operators (P6-P11, F1-F5 — SURVEY.md §2.2-2.3).

Every function here compiles to built-in Catalyst expressions (no Python
UDFs), so the whole silver typing layer stays inside whole-stage codegen
and scales linearly with executor count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_columns(df: DataFrame, required: list[str], table: str = "") -> DataFrame:
    """Presence-only schema validation that raises on missing columns.

    Matches the reference's ``validate_schema`` (``flows/silver.py:48-52``),
    which checks column presence only, not types.
    """
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing columns in {table or 'dataframe'}: {missing}")
    return df


def strict_cast(col: str | Column, dtype: str) -> Column:
    """Strict cast (P6): ``cast(Int64)`` per ``flows/silver.py:65-67``.

    Under non-ANSI Spark, invalid input becomes NULL rather than raising;
    the reference raises. Callers that need raise-on-invalid semantics
    wrap this in an assertion count (see flows.silver).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(dtype)


def lenient_cast(col: str | Column, dtype: str) -> Column:
    """Lenient cast (P7): ``cast(Int64, strict=False)`` — invalid→NULL
    (``flows/silver.py:86,93``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def drop_embedded_header_rows(df: DataFrame, key: str = "id") -> DataFrame:
    """P11: drop rows where the PK cell contains the header token — the
    residue of chunked landing files that re-attach the CSV header per
    chunk (``flows/silver.py:108``, chunker at ``flows/landing.py:37-47``).
    """
    return df.filter(~F.col(key).cast("string").contains(key))


def clean_none_rows(df: DataFrame, *cols: str) -> DataFrame:
    """P10: drop rows whose column holds the literal string ``'None'``
    (``main.py:86``). NULLs are also dropped (null-propagating ``!=``),
    matching the reference engines' comparison semantics.
    """
    out = df
    for c in cols:
        out = out.filter(F.col(c) != "None")
    return out


def extract_first_year(col: str | Column) -> Column:
    """F1: first 4-digit group in a free-text range string → Int64
    (``flows/silver.py:91-94`` — ``start_year`` from ``active``).
    ``regexp_extract`` yields '' on no-match; try_cast maps that to NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(\d{4})", 1).try_cast("long")


def pipe_to_comma(col: str | Column) -> Column:
    """F2: replace all ``|`` with ``,`` (``flows/silver.py:113``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\|", ",")


def normalize_country(col: str | Column) -> Column:
    """F4+F5: lower + trim, the gold-zone country normalization
    (``flows/gold.py:117-119``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))

"""Data-quality expectations: declarative rules evaluated corpus-
parallel in ONE pass, reported as a per-rule violations table — the
Great-Expectations-style gate every production pipeline runs between
zones (the reference validates implicitly via its dataset allowlist,
``flows/bronze.py``; this makes the contract explicit and auditable).

Design for scale: every rule compiles to a Catalyst boolean column, and
the whole rule set evaluates in a single aggregation over one scan —
adding a rule adds a column, never a pass. Uniqueness is the one rule
that needs a shuffle; it runs as a groupBy on the key column and unions
its one result row with the scan-aggregate rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named predicate every row is expected to satisfy."""

    name: str
    predicate: Column  # True = row passes


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def expect_in_set(col: str, allowed: list) -> Expectation:
    return Expectation(
        f"{col}_in_set", F.col(col).isin(allowed) | F.col(col).isNull()
    )


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"{col}_between",
        (F.col(col) >= lo) & (F.col(col) <= hi) | F.col(col).isNull(),
    )


def expect_matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"{col}_matches", F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def run_expectations(
    df: DataFrame,
    expectations: list[Expectation],
    unique_key: Optional[str] = None,
) -> DataFrame:
    """Evaluate all expectations in one scan-aggregate.

    Returns (rule, n_rows, n_violations, pass) — one row per rule.
    ``unique_key`` adds a uniqueness rule (n_violations = rows beyond
    the first per key), computed with the only shuffle in the plan.
    """
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("_n")] + [
        F.sum(F.when(e.predicate, 0).otherwise(1)).alias(e.name)
        for e in expectations
    ]
    row = df.agg(*aggs)
    per_rule = None
    for e in expectations:
        entry = row.select(
            F.lit(e.name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(e.name).cast("long").alias("n_violations"),
            (F.col(e.name) == 0).alias("pass"),
        )
        per_rule = entry if per_rule is None else per_rule.unionAll(entry)
    if unique_key is not None:
        dup = df.groupBy(unique_key).agg(F.count(F.lit(1)).alias("_c"))
        uniq = dup.agg(
            F.lit(f"{unique_key}_unique").alias("rule"),
            F.sum("_c").alias("n_rows"),
            F.sum(F.col("_c") - 1).cast("long").alias("n_violations"),
            (F.sum(F.col("_c") - 1) == 0).alias("pass"),
        )
        per_rule = uniq if per_rule is None else per_rule.unionAll(uniq)
    return per_rule


def expect_expr(name: str, predicate: Column) -> Expectation:
    """Generic expectation from any Catalyst boolean expression —
    cross-column invariants (`n_chars == length(text)`), conditional
    rules, anything a single-row predicate can express. Same one-pass
    evaluation as the built-in rules."""
    return Expectation(name, predicate)

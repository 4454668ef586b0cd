"""Declarative data-quality expectations (constraint audit + quarantine).

The reference enforces quality implicitly — hard-coded dropna subsets
scattered through its transformers (reference src/etl/transformation.py:
150-154, 328-331, 532-533) — so "how many rows violated what" is
unknowable. This operator makes constraints first-class, the
dbt-test / Delta-constraint capability:

- `audit(df, rules)` — ONE scan, one global aggregate: every rule becomes
  a `sum(violates)` column, unpivoted to (rule, n_violations, n_rows).
  No per-rule rescans; adding a rule adds an expression, not a job.
- `enforce(df, rules)` — row-level split: rows tagged with the ARRAY of
  rules they violate; clean rows flow on, violators quarantine with full
  context (the JSONL-source quarantine pattern generalized to semantics).
- `unique_key_violations(df, cols)` — the one constraint that needs a
  shuffle (group-by count > 1); kept separate so the scan-local audit
  stays shuffle-free.

Rules are (name, Column-predicate) pairs where the predicate states what
GOOD rows satisfy; NULL predicate results count as violations (SQL
three-valued logic would silently pass them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, Column]


def _violates(cond: Column) -> Column:
    # NOT cond, with NULL (unknown) counted as a violation
    return F.when(cond.isNull() | ~cond, 1).otherwise(0)


def audit(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_rows, n_violations) per rule — single scan, no shuffle
    beyond the final 1-row aggregate."""
    aggs = [F.count("*").alias("__n")] + [
        F.sum(_violates(cond)).alias(f"__v_{i}") for i, (_, cond) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', __v_{i}" for i, (name, _) in enumerate(rules))
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


def enforce(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined); quarantined rows carry
    `violations: array<string>` naming every failed rule."""
    marks = F.array_compact(
        F.array(
            *[
                F.when(_violates(cond) == 1, F.lit(name))
                for name, cond in rules
            ]
        )
    )
    tagged = df.withColumn("violations", marks)
    clean = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return clean, bad


def unique_key_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keys appearing more than once: (key cols..., n_occurrences)."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )

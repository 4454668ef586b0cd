"""Incremental aggregate maintenance (materialized-view delta update).

The reference recomputes every output from scratch on each run — its sink
is full-refresh TRUNCATE + insert (reference src/etl/loading.py:49-60) and
the pipeline re-reads whole inputs every time (src/etl/datapipeline.py:
61-152). At 100 TB that is untenable: aggregate history ONCE into a
compact keyed STATE table, then fold each new batch in by combining
partial aggregates — an O(|state| + |delta|) merge with one shuffle on
the group keys, never an O(|history|) rescan.

Correctness rests on associativity: every state measure is a commutative
monoid (count -> sum, decimal sum -> sum, min -> min, max -> max), and the
double-typed measure is carried as an exact DECIMAL inside the state, so

    finalize(merge(state(A), state(B))) == finalize(state(A U B))

holds bit-exactly regardless of how history was batched. avg-style
measures are derived at finalize time (sum/count), never stored.

Scale notes: the state table is keyed and small relative to raw history
(|keys| rows, not |events| rows); the merge shuffles only state+delta on
the group keys and is broadcast-able when the delta's key set is small.
State round-trips through parquet unchanged (decimal and timestamp types
are preserved), so the MV can live in object storage between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state measure columns appended to the group keys
STATE_COLS = ("n_rows", "sum_dec", "min_ts", "max_ts")


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    scale: int = 2,
) -> DataFrame:
    """Partial-aggregate a batch of raw rows into mergeable state."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).alias("sum_dec"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )


def merge_states(state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two mergeable states (associative/commutative per measure).

    `unionByName` tolerates the decimal-precision widening Spark applies to
    summed decimals (decimal(18,s) rows sum to decimal(28,s) state; merging
    widens again toward the 38-digit cap — exact throughout).
    """
    u = state.unionByName(delta_state, allowMissingColumns=False)
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Project the user-facing view of the state (exact decimal -> double,
    derived measures computed here so they are never stored)."""
    return state.select(
        *keys,
        F.col("n_rows"),
        F.col("sum_dec").cast("double").alias("sum_value"),
        (F.col("sum_dec").cast("double") / F.col("n_rows")).alias("avg_value"),
        "min_ts",
        "max_ts",
    )

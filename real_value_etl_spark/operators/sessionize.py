"""Gap-based sessionization (batch) — lag + cumulative-flag pattern.

SURVEY.md §2.9: the reference is strictly batch with no session concept;
this is the batch form of the streaming session window (see streaming/),
and its semantics exactly match ``F.session_window`` with the same gap.

Scale design: two window passes over ONE shuffle on (key) — the lag and
the running session counter share partitioning/ordering, so Catalyst plans
a single Exchange + Sort feeding both Window operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same key exceeds `gap_seconds`. Output: input columns +
    ``session_seq`` (1-based per key)."""
    w = Window.partitionBy(key).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev_ts) > gap_seconds),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(new_sess).over(wcum))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: (key, session_seq, session_start, session_end,
    n_events[, sum_value]). One extra hash-agg after sessionize — the
    groupBy keys are a prefix of the window partitioning, so AQE keeps it
    co-partitioned (no second full shuffle of the fact table)."""
    sess = sessionize(df, key, ts, gap_seconds)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return sess.groupBy(key, "session_seq").agg(*aggs)

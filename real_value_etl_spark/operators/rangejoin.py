"""Keyed interval (range) join — point-in-interval matching at scale.

SURVEY.md §2.3 lists range/theta joins among the north-star join shapes the
reference lacks. Spark executes a naive non-equi join as
BroadcastNestedLoopJoin (needs one broadcastable side) or a cartesian
product — neither survives two large fact tables. This operator turns a
keyed point-in-interval join into an EQUI join:

1. bucket every point by ``floor(epoch_sec / bucket_seconds)``;
2. explode every interval into the (few) buckets it overlaps;
3. shuffle hash/sort-merge join on ``(key, bucket)``;
4. re-apply the exact range predicate as a residual filter.

Each point lives in exactly one bucket, so a (point, interval) pair can
match at most once — no post-join dedup is needed. The explosion factor is
``ceil(interval_len / bucket_seconds) + 1``; pick ``bucket_seconds`` near
the typical interval length to keep it ~2.

Scale design: one shuffle on (key, bucket) for each side, no broadcast
requirement, no pair explosion beyond actual bucket overlaps — the plan
shape that survives 100 TB on both inputs. The plan is asserted
nested-loop-free in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BOUNDS = {"()", "(]", "[)", "[]"}


def _bucket(ts: Column, bucket_seconds: int) -> Column:
    # unix_timestamp truncates to whole seconds; residual re-checks exact
    # bounds, so truncation only has to be monotone (it is).
    return F.floor(F.unix_timestamp(ts) / F.lit(bucket_seconds)).cast("long")


def interval_join_keyed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int,
    bounds: str = "(]",
) -> DataFrame:
    """Inner-join each point row to every interval row with the same ``key``
    whose [start, end] range contains ``point_ts`` (``bounds`` picks
    open/closed endpoints, default ``(]``: start-exclusive, end-inclusive).

    Column sets must be disjoint apart from ``key``. Returns all columns
    from both inputs (one ``key`` column).
    """
    if bounds not in _BOUNDS:
        raise ValueError(f"bounds must be one of {sorted(_BOUNDS)}")
    pb = points.withColumn("__b", _bucket(F.col(point_ts), bucket_seconds))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(interval_start), bucket_seconds),
                _bucket(F.col(interval_end), bucket_seconds),
            )
        ),
    )
    lo = (
        F.col(point_ts) > F.col(interval_start)
        if bounds[0] == "("
        else F.col(point_ts) >= F.col(interval_start)
    )
    hi = (
        F.col(point_ts) < F.col(interval_end)
        if bounds[1] == ")"
        else F.col(point_ts) <= F.col(interval_end)
    )
    return pb.join(ib, on=[key, "__b"], how="inner").filter(lo & hi).drop("__b")

"""As-of (point-in-time) join — the one operator SURVEY.md §2.3 flags as
genuinely custom (Spark has no built-in; DuckDB oracle uses ASOF JOIN).

Implementation: the union+window trick, NOT a pairwise range join —
tag both inputs, union them, and for every left row take the latest
preceding right row via ``last(..., ignorenulls=True)`` over a window
partitioned by the key and ordered by (ts, side).

Scale design: exactly ONE shuffle on (key), then a per-key sort — no
row-pair explosion, no broadcast requirement on either side. This is the
plan shape that survives 100 TB: a backward as-of join over two fact
tables costs the same as a single window function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts for the same key (DuckDB ``ASOF JOIN`` semantics,
    ties included). Left rows with no preceding right row keep NULLs.

    Returned columns: all left columns + ``asof_<right_ts>`` +
    ``asof_<c>`` for each right value column.
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right (0) sorts before left (1) at ts ties
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in [right_ts, *right_value_cols]],
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in [right_ts, *right_value_cols]],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        *lcols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in [right_ts, *right_value_cols]
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    right_ts >= left_ts for the same key — the forward/next-event as-of
    (time-to-response measurement, next-login-after-purchase). Mirror of
    `asof_join_backward`: same one-shuffle union+window plan with the
    frame reversed (first following non-null instead of last preceding).
    At ts ties the right row counts (>= semantics), so LEFT (0) sorts
    before right (1) ascending and the frame starts at the current row;
    `tiebreak` names a right column (e.g. its unique event id) that
    orders same-(key, ts) right rows deterministically — without it two
    equal-ts right rows could swap between runs."""
    lcols = left.columns
    rcols = [right_ts, *right_value_cols]
    tb = [tiebreak] if tiebreak and tiebreak not in rcols else []
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in [*rcols, *tb]],
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in [*rcols, *tb]],
    )
    unioned = tagged_l.unionByName(tagged_r)
    order = ["__ts", "__side"] + (
        [f"__r_{tiebreak}"] if tiebreak else []
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "__side",
        *lcols,
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"next_{c}")
            for c in rcols
        ],
    )
    return filled.filter(F.col("__side") == 0).drop("__side")

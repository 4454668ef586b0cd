"""Global running aggregates without a single-partition window.

The naive `SUM(x) OVER (ORDER BY k)` plans an Exchange SinglePartition —
the entire dataset flows through ONE task, which is exactly the shape that
cannot survive 100 TB. The scalable form is the classic two-phase parallel
scan:

1. range-partition by the order key (so partition i holds a contiguous key
   range, all ranges ordered by partition id) and compute ordinary
   per-partition prefix sums — fully parallel;
2. aggregate one total per partition (a tiny n_partitions-row frame),
   compute each partition's starting offset with a window over THAT frame
   (single-partition, but over ~dozens of rows), and broadcast it back.

prefix + offset = the exact global running sum. With decimal accumulation
the regrouping changes nothing (decimal addition is associative), so the
result is bit-identical to the sequential definition the oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    n_partitions: int = 32,
    decimal_type: str = "decimal(38,2)",
) -> DataFrame:
    """Exact global running sum of `value_col` (pre-cast it to a decimal
    type for exactness) in `order_cols` order, computed scalably.

    `order_cols` must be a unique key (ties that straddle a range-partition
    boundary would make per-partition prefixes ill-defined)."""
    val = F.col(value_col).cast(decimal_type)
    part = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_prefix = part.withColumn("__prefix", F.sum(val).over(w_in))
    totals = part.groupBy("__pid").agg(F.sum(val).alias("__psum"))
    w_tot = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__psum").over(w_tot), F.lit(0).cast(decimal_type))
        .alias("__offset"),
    )
    return (
        with_prefix.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__prefix") + F.col("__offset")))
        .drop("__pid", "__prefix", "__offset")
    )


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_max",
    n_partitions: int = 32,
) -> DataFrame:
    """Exact global running MAX of `value_col` in `order_cols` order,
    by the same two-phase scan as `global_running_sum` — max is
    associative and order-insensitive within a prefix, so per-partition
    running maxes + a broadcast prefix-max-of-partition-maxes compose
    exactly (any comparable type; no decimal cast needed).

    `order_cols` must be a unique key, as for the sum variant."""
    part = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_prefix = part.withColumn("__prefix", F.max(F.col(value_col)).over(w_in))
    totals = part.groupBy("__pid").agg(F.max(F.col(value_col)).alias("__pmax"))
    w_tot = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.max("__pmax").over(w_tot).alias("__offset")
    )
    return (
        with_prefix.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.greatest(F.col("__prefix"), F.col("__offset")))
        .drop("__pid", "__prefix", "__offset")
    )

"""Statistical aggregates: exact percentiles, dispersion, and the
approximate-aggregate surface for interactive exploration at scale.

Exact `percentile` and `stddev_samp` are bit-identical between Spark and
DuckDB (verified at sf0.01) and get full oracles. `corr` differs in final
ulps (different accumulation order) and the approx sketches
(approx_count_distinct=HLL++, percentile_approx=KLL) are by construction
engine-specific — those register as rows-only checks, which is exactly the
contract SURVEY §2.4 assigns them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table


@register(
    "q_stats_quantity",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS median,
           quantile_cont(l_quantity, 0.75) AS q75,
           stddev_samp(l_quantity) AS sd,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_stats_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics + dispersion per return flag. Exact
    percentile requires a per-group sort — fine for low-cardinality groups;
    use percentile_approx (below) for high-cardinality exploration."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.stddev_samp("l_quantity").alias("sd"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_approx_stats",
    oracle=None,  # sketches are engine-specific by construction: rows-only
    tags=("agg", "approx"),
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB interactivity: HLL++ distinct counts
    (constant memory per group vs exact distinct's shuffle of every key)
    and KLL approximate percentiles (single pass, no sort)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10_000).alias(
            "price_quantiles"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram (binning + agg, width_bucket family)
# ---------------------------------------------------------------------------
HIST_LO, HIST_HI, HIST_NBINS = 0.0, 600_000.0, 20
HIST_STEP = (HIST_HI - HIST_LO) / HIST_NBINS


@register(
    "q_histogram_totalprice",
    oracle=f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - {HIST_LO!r}) / {HIST_STEP!r}) AS INT),
                   {HIST_NBINS - 1}) AS bin,
             o_totalprice
      FROM orders
    )
    SELECT bin,
           bin * {HIST_STEP!r} AS bin_lo,
           (bin + 1) * {HIST_STEP!r} AS bin_hi,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM b GROUP BY bin
    """,
    tags=("agg", "histogram"),
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value histogram: 20 fixed bins over [0, 600k], top bin clamps
    the tail. The SAME floor((x-lo)/step) double math runs in both engines
    (no width_bucket — its edge semantics differ), so bin assignment is
    bit-exact. Narrow map + single partial-agg shuffle of <=20 groups."""
    o = table(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(HIST_STEP)).cast("int"),
        F.lit(HIST_NBINS - 1),
    )
    return (
        o.select(bin_.alias("bin"), "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "bin",
            (F.col("bin") * HIST_STEP).alias("bin_lo"),
            ((F.col("bin") + 1) * HIST_STEP).alias("bin_hi"),
            "n_orders",
            "min_price",
            "max_price",
        )
    )

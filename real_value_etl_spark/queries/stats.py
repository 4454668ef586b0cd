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

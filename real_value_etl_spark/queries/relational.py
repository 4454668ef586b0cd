"""Relational query surface: joins, aggregations, windows, sorts, set ops.

The reference has NO joins/aggregations/windows (SURVEY.md §2.3-2.7 — its only
multi-input op is a union); this module supplies the full Spark-native
relational surface the capability target mandates, demonstrated on the
driver's TPC-H-ish tables and oracle-checked against DuckDB.

Scale notes (100 TB):
- dimension joins (region/nation/customer/supplier/part) are broadcast —
  Catalyst picks BroadcastHashJoin under the configured threshold and we
  hint `F.broadcast` explicitly on the provably-small sides;
- fact-fact joins (orders x lineitem) shuffle on the join key; AQE handles
  skew/coalescing;
- aggregates use hash aggregation with partial (map-side) combine — free in
  Spark for all F.* aggregate functions;
- doubles are aggregated via per-row DECIMAL cast -> exact decimal SUM ->
  DOUBLE, which is order-independent (bit-exact vs the oracle) AND avoids
  a second pass; avg = exact_sum / count in IEEE double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register, table


def _dsum(col, scale: int = 2):
    """Order-independent SUM of a double column: exact decimal accumulate."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _dsum_expr(col, scale: int = 6):
    """Same for a computed double expression. Scale 6 because TPC-H-ish
    money products have <=6 exact decimal digits (2dp x 2dp x 2dp) -> the
    double->decimal cast is exact, never at a rounding boundary."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Q1 — pricing summary (scan + filter + hash agg; TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    -- every decimal -> double goes THROUGH VARCHAR (r10 class): DuckDB's
    -- direct decimal cast mis-rounds once unscaled digits exceed 2^53,
    -- which the scale-6 charge sums do at ~10x the driver scale
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
           AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
           AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(28,6))) AS VARCHAR)
           AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(28,6))) AS VARCHAR)
           AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR)
           AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "scan"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report. Single scan, filter pushed to parquet,
    partial+final hash aggregation (no reference analogue; SURVEY §2.4)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum_expr(disc_price).alias("sum_disc_price"),
            _dsum_expr(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount"), 4) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (3-way join + agg + top-k)
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey AS l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      o.o_orderdate AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue top-10. customer is broadcast (small dim);
    orders x lineitem shuffles on orderkey. Tie-broken by l_orderkey."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way star join)
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier",
    oracle="""
    SELECT
      n.n_name AS n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    tags=("join", "agg", "star"),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where supplier and customer share a nation.
    All dims broadcast; the single shuffle is lineitem x orders on orderkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue (pure scan+filter+agg; pushdown showcase)
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-increase forecast. All four predicates + the 2-column
    projection reach the parquet scan (PushedFilters / ReadSchema)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _dsum_expr(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Top customers by spend (join + agg + top-k with tiebreak)
# ---------------------------------------------------------------------------
@register(
    "q_top_customers",
    oracle="""
    SELECT c.c_custkey AS c_custkey,
           c.c_name AS c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lifetime spend. Aggregate orders FIRST (shrinks
    the fact side before the join), then broadcast-join the dim."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        _dsum(F.col("o_totalprice")).alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    return (
        spend.join(F.broadcast(c), spend.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Window functions: rank / lag over partitions
# ---------------------------------------------------------------------------
@register(
    "q_window_order_rank",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey,
        o_orderkey,
        CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        ROW_NUMBER() OVER w AS rn,
        RANK() OVER w AS rnk,
        CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ) t WHERE rn <= 3
    """,
    tags=("window",),
)
def q_window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 orders per customer with rank, previous price, running spend.
    One shuffle on o_custkey shared by all four window functions
    (same partitioning/ordering => single Window exchange). SURVEY §2.5."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(wsum)
            .cast("double")
            .alias("running_spend"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# ROLLUP (grouping sets)
# ---------------------------------------------------------------------------
@register(
    "q_rollup_returnflag",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      COUNT(*) AS n_items,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP — grouping-set expansion happens in a
    single aggregation pass (Spark Expand operator), not N scans."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n_items",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# CUBE
# ---------------------------------------------------------------------------
@register(
    "q_cube_orders",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over status x priority."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------
@register(
    "q_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def q_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (Spark expands to a two-phase agg)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------
@register(
    "q_semi_anti_customers",
    oracle="""
    SELECT c_custkey, c_name, has_order FROM (
      SELECT c_custkey, c_name, TRUE AS has_order
      FROM customer c WHERE EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderstatus = 'F')
      UNION ALL
      SELECT c_custkey, c_name, FALSE AS has_order
      FROM customer c WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderstatus = 'F')
    ) t
    """,
    tags=("join", "semi", "anti"),
)
def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI join against finished orders, unioned with a
    flag. Semi/anti avoid materializing the probe side's payload."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit(True).alias("has_order")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit(False).alias("has_order")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
@register(
    "q_setops_parts",
    oracle="""
    SELECT p_partkey, 'both' AS which FROM (
      SELECT DISTINCT l_partkey AS p_partkey FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'O'
    ) a
    UNION ALL
    SELECT p_partkey, 'f_only' AS which FROM (
      SELECT DISTINCT l_partkey AS p_partkey FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
      EXCEPT
      SELECT DISTINCT l_partkey FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'O'
    ) b
    """,
    tags=("setop",),
)
def q_setops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts appearing in both finished and open orders (INTERSECT) vs only
    finished (EXCEPT). SURVEY §2.7."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lo = l.join(o, l.l_orderkey == o.o_orderkey)
    f_parts = (
        lo.filter(F.col("o_orderstatus") == "F")
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    o_parts = (
        lo.filter(F.col("o_orderstatus") == "O")
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    both = f_parts.intersect(o_parts).select("p_partkey", F.lit("both").alias("which"))
    f_only = f_parts.exceptAll(o_parts).select(
        "p_partkey", F.lit("f_only").alias("which")
    )
    return both.unionByName(f_only)


# ---------------------------------------------------------------------------
# Theta / range join: lineitems shipped long after order date
# ---------------------------------------------------------------------------
@register(
    "q_ship_lag",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority,
           COUNT(*) AS n_late,
           CAST(SUM(CAST((EPOCH(l.l_shipdate) - EPOCH(o.o_orderdate)) / 86400.0
                AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_lag_days
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "range", "agg"),
)
def q_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipments >90 days after order date: equi-join on orderkey with a
    non-equi residual predicate (stays a hash join, NOT a nested loop —
    the range condition is applied as a post-join filter)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lag_days = (
        F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")
    ) / 86400.0
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_late"),
            (_dsum_expr(lag_days) / F.count("*")).alias("avg_lag_days"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (arbitrary aggregation lattice + GROUPING() disambiguation)
# ---------------------------------------------------------------------------
@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "grouping_sets", "sql"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping lattice — finer than ROLLUP/CUBE lets the engine
    compute exactly the requested combinations in ONE pass (Expand + single
    shuffle, not one job per set); GROUPING() distinguishes a grouped-out
    NULL from a data NULL, which ROLLUP output alone cannot."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               GROUPING(l_returnflag) AS g_rf,
               GROUPING(l_linestatus) AS g_ls
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Top-k per group (rank filter -> WindowGroupLimit pushdown)
# ---------------------------------------------------------------------------
@register(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, rnk,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) t
    WHERE rnk <= 3
    """,
    tags=("window", "topk", "join"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment. The rank<=k predicate triggers
    Spark's WindowGroupLimit: each task keeps only its local top-3 per
    group BEFORE the window shuffle and sort, so the exchange moves
    O(groups x k x tasks) rows, not the whole orders table — the
    difference between a window and a full sort at 100 TB. Tie-broken
    on orderkey for a deterministic result."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.row_number().over(w).alias("rnk"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# SQL-text entry point: the same engine surface via spark.sql over views
# ---------------------------------------------------------------------------
_SQL_TEXT = """
WITH yearly AS (
  SELECT n.n_name AS nation,
         YEAR(o.o_orderdate) AS o_year,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(28,6))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, YEAR(o.o_orderdate)
)
SELECT nation, o_year, revenue,
       LAG(revenue) OVER (PARTITION BY nation ORDER BY o_year) AS prev_revenue
FROM yearly
"""


@register(
    "q_sql_text_interface",
    oracle="""
    WITH yearly AS (
      SELECT n.n_name AS nation,
             EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    )
    SELECT nation, CAST(o_year AS BIGINT) AS o_year, revenue,
           LAG(revenue) OVER (PARTITION BY nation ORDER BY o_year)
             AS prev_revenue
    FROM yearly
    """,
    tags=("sql", "join", "window", "agg"),
)
def q_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL-TEXT surface: driver tables registered as temp views
    and the query executed as ANSI SQL via spark.sql — same Catalyst plan
    (broadcast dims, partial agg, one window exchange) as the DataFrame API;
    nation-year revenue with a LAG year-over-year comparison."""
    for t in ("lineitem", "orders", "customer", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    df = spark.sql(_SQL_TEXT)
    return df.withColumn("o_year", F.col("o_year").cast("long"))


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------
@register(
    "q_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, last_order, frequency, monetary,
             NTILE(5) OVER (ORDER BY last_order DESC, custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score,
           COUNT(*) AS n_customers,
           CAST(MIN(custkey) AS BIGINT) AS min_custkey,
           CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
             AS segment_value
    FROM scored GROUP BY r_score, f_score
    """,
    tags=("relational", "window", "segmentation"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (latest order
    date), frequency (order count), monetary (exact-decimal revenue
    sum), each quintile-ranked with deterministic tiebreaks, rolled up
    into the R×F segment grid with exact-decimal segment value — the
    classic marketing-analytics segmentation as one pipeline. The
    quintile ranks are NOT `NTILE OVER (ORDER BY ...)` — that plans an
    Exchange SinglePartition over the whole customer frame. They come
    from `global_ntile` (operators/scan.py): range-partition on the
    composite sort key, rank locally, broadcast per-partition offsets
    back, and turn rank+count into the bucket arithmetically —
    bit-identical NTILE semantics (ties split across buckets by the
    custkey tiebreak, exactly as the oracle's window), with the only
    single-partition window running over the ~32-row partition-count
    frame. Plan-pinned by test_ntile_queries_are_two_phase. Aggregations are
    decimal-exact so the segment values hash-match."""
    from ..operators.scan import global_ntile

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    scored = global_ntile(
        per_cust, [F.desc("last_order"), F.asc("custkey")], 5, "r_score"
    )
    scored = global_ntile(
        scored, [F.desc("frequency"), F.asc("custkey")], 5, "f_score"
    )
    # the oracle's scored CTE also computes m_score, but the output grid
    # only groups on r x f — the m quintile is dead in the projection, so
    # we skip its range shuffle entirely (monetary itself still feeds
    # segment_value).
    return scored.groupBy("r_score", "f_score").agg(
        F.count("*").alias("n_customers"),
        F.min("custkey").alias("min_custkey"),
        F.sum(F.col("monetary").cast("decimal(18,2)"))
        .cast("double")
        .alias("segment_value"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (association rules over order line items)
# ---------------------------------------------------------------------------
BASKET_MIN_SUPPORT = 2  # pair must co-occur in >= this many orders
BASKET_TOP_K = 20


@register(
    "orders_market_basket",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT okey) AS n FROM items),
    isup AS (SELECT pkey, COUNT(*) AS cnt FROM items GROUP BY pkey),
    pairs AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b, COUNT(*) AS cnt_ab
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY a.pkey, b.pkey
      HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT part_a, part_b, cnt_ab,
           sa.cnt AS cnt_a, sb.cnt AS cnt_b,
           CAST(n.n * cnt_ab AS DOUBLE) / (sa.cnt * sb.cnt) AS lift
    FROM pairs
    JOIN isup sa ON sa.pkey = part_a
    JOIN isup sb ON sb.pkey = part_b
    CROSS JOIN n_orders n
    ORDER BY lift DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
    tags=("relational", "join", "association", "co-occurrence"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: part pairs co-purchased within the same
    order, with support counts and LIFT = N·c(a,b)/(c(a)·c(b)) — the
    association-rule primitive behind recommendations, ranked by lift
    (integer-product ratio, one division — log-free, so ranking is
    bit-portable; same trick as text_collocations). The pair join is
    PER-ORDER: both sides key on l_orderkey, so the worst partition is
    bounded by max-items-per-order² (single digits in this schema) — a
    basket can never form a quadratic hot key the way a viral token can.
    Item supports and the single-row order count broadcast back onto the
    pair table. Top-k is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    n_orders = items.select("okey").distinct().agg(F.count("*").alias("n"))
    isup = items.groupBy("pkey").agg(F.count("*").alias("cnt"))
    a = items.select("okey", F.col("pkey").alias("part_a"))
    b = items.select("okey", F.col("pkey").alias("part_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= BASKET_MIN_SUPPORT)
    )
    sa = isup.select(F.col("pkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    sb = isup.select(F.col("pkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            (
                (F.col("n") * F.col("cnt_ab")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


# ---------------------------------------------------------------------------
# Percent-of-parent over ROLLUP (the OLAP drill-down share idiom)
# ---------------------------------------------------------------------------
@register(
    "q_rollup_share_of_parent",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag) AS g_flag,
             GROUPING(l_linestatus) AS g_status,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    )
    SELECT c.l_returnflag, c.l_linestatus, c.g_flag, c.g_status, c.qty,
           CASE
             WHEN c.g_flag = 1 THEN 1.0
             WHEN c.g_status = 1 THEN
               c.qty / (SELECT qty FROM r WHERE g_flag = 1)
             ELSE c.qty / (SELECT p.qty FROM r p
                           WHERE p.g_status = 1 AND p.g_flag = 0
                             AND p.l_returnflag = c.l_returnflag)
           END AS share_of_parent
    FROM r c
    """,
    tags=("relational", "rollup", "olap"),
)
def q_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent across a ROLLUP lattice — the drill-down share
    every OLAP report shows next to a subtotal: each (flag, status) leaf
    divides by its flag subtotal, each flag subtotal by the grand total,
    the grand total is 1.0. One ROLLUP aggregation (Expand + single
    shuffle) produces all three levels; parents attach via one
    flag-keyed self-join of the tiny rollup result plus a broadcast
    one-row grand total — never a second scan of the fact table.
    Quantities are exact-decimal sums cast to double, shares a single
    division each, so every level hash-matches."""
    li = table(spark, sf_dir, "lineitem")
    r = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
    grand = r.filter(F.col("g_flag") == 1).select(
        F.col("qty").alias("grand_qty")
    )
    flag_tot = r.filter((F.col("g_status") == 1) & (F.col("g_flag") == 0)).select(
        F.col("l_returnflag").alias("p_flag"), F.col("qty").alias("flag_qty")
    )
    return (
        r.crossJoin(F.broadcast(grand))
        .join(
            F.broadcast(flag_tot),
            F.col("l_returnflag").eqNullSafe(F.col("p_flag")),
            "left",
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "g_flag",
            "g_status",
            "qty",
            F.when(F.col("g_flag") == 1, F.lit(1.0))
            .when(F.col("g_status") == 1, F.col("qty") / F.col("grand_qty"))
            .otherwise(F.col("qty") / F.col("flag_qty"))
            .alias("share_of_parent"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative-gains / lift curve over customer-value deciles
# ---------------------------------------------------------------------------
@register(
    "q_cumulative_gains",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT custkey, spend,
             NTILE(10) OVER (ORDER BY spend DESC, custkey) AS decile
      FROM per_cust
    ),
    per_decile AS (
      SELECT decile,
             COUNT(*) AS n_customers,
             SUM(spend) AS decile_rev
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(decile_rev AS DOUBLE) AS decile_rev,
           CAST(SUM(decile_rev) OVER (ORDER BY decile) AS DOUBLE) AS cum_rev,
           CAST(SUM(decile_rev) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(decile_rev) OVER () AS DOUBLE) AS cum_rev_share,
           (CAST(decile_rev AS DOUBLE) / CAST(SUM(decile_rev) OVER () AS DOUBLE))
             / (CAST(n_customers AS DOUBLE)
                / CAST(SUM(n_customers) OVER () AS DOUBLE)) AS lift
    FROM per_decile
    """,
    tags=("relational", "window", "segmentation", "evaluation"),
)
def q_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains and lift curve: customers decile-ranked by exact
    total spend (best first); each decile reports its revenue, the
    running revenue through that decile, the cumulative revenue SHARE
    (the gains curve a targeting model is judged by), and lift (revenue
    share over customer share). The heavy work is one per-customer
    aggregate; the decile rank is `global_ntile` (operators/scan.py) —
    two-phase range-partitioned rank + broadcast offsets, bit-identical
    to the oracle's NTILE but with no Exchange SinglePartition over the
    customer frame (plan-pinned by test_ntile_queries_are_two_phase);
    the cumulative windows then run over the TEN-row decile
    frame — bounded by construction. Decimal sums end-to-end: every
    double is one division of exact decimals, so the curve hash-matches
    the oracle."""
    from ..operators.scan import global_ntile

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    ranked = global_ntile(
        per_cust, [F.desc("spend"), F.asc("custkey")], 10, "decile"
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("spend").alias("decile_rev"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.sum("decile_rev").over(wcum).cast("double")
    tot = F.sum("decile_rev").over(wall).cast("double")
    ncust_tot = F.sum("n_customers").over(wall).cast("double")
    return per_decile.select(
        "decile",
        "n_customers",
        F.col("decile_rev").cast("double").alias("decile_rev"),
        cum.alias("cum_rev"),
        (cum / tot).alias("cum_rev_share"),
        (
            (F.col("decile_rev").cast("double") / tot)
            / (F.col("n_customers").cast("double") / ncust_tot)
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# ANSI try_* scalar surface (error-tolerant arithmetic under ANSI mode)
# ---------------------------------------------------------------------------
@register(
    "q_try_arithmetic",
    oracle="""
    WITH t AS (
      SELECT l_linestatus,
             CASE WHEN l_linenumber - l_linenumber = 0 THEN NULL
                  ELSE l_extendedprice / (l_linenumber - l_linenumber) END
               AS div0,
             CASE WHEN l_orderkey > 0 THEN NULL
                  ELSE l_orderkey END AS ovf,
             TRY_CAST(l_returnflag AS DOUBLE) AS bad_cast,
             [l_quantity][1] AS first_el,
             CASE WHEN len([l_quantity]) >= 99 THEN [l_quantity][99]
                  ELSE NULL END AS oob_el
      FROM lineitem
    )
    SELECT l_linestatus,
           COUNT(*) AS n,
           COUNT(div0) AS n_div_ok,
           COUNT(ovf) AS n_add_ok,
           COUNT(bad_cast) AS n_cast_ok,
           COUNT(first_el) AS n_first,
           COUNT(oob_el) AS n_oob
    FROM t GROUP BY l_linestatus
    """,
    tags=("relational", "functions", "ansi"),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-TOLERANT scalar surface under ANSI mode: Spark 4 runs
    ANSI-on, where division by zero, integer overflow, and malformed
    casts RAISE — correct for an engine, fatal for exploratory queries
    over dirty data. The `try_*` family returns NULL instead, per
    expression, without globally disabling ANSI: try_divide on an
    engineered zero, try_add at bigint overflow, try_cast of a
    non-numeric flag string, try_element_at in and out of bounds. The oracle
    mirrors each with explicit CASE/TRY_CAST guards (DuckDB's own
    semantics differ per op — out-of-range list index yields NULL
    natively, arithmetic raises), so the NULL-production contract is
    pinned by counting survivors per group."""
    li = table(spark, sf_dir, "lineitem")
    arr = F.array(F.col("l_quantity"))
    t = li.select(
        "l_linestatus",
        F.try_divide(
            F.col("l_extendedprice"),
            F.col("l_linenumber") - F.col("l_linenumber"),
        ).alias("div0"),
        F.try_add(
            F.col("l_orderkey"), F.lit(9223372036854775807)
        ).alias("ovf"),
        F.col("l_returnflag").try_cast("double").alias("bad_cast"),
        F.try_element_at(arr, F.lit(1)).alias("first_el"),
        F.try_element_at(arr, F.lit(99)).alias("oob_el"),
    )
    return t.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.count("div0").alias("n_div_ok"),
        F.count("ovf").alias("n_add_ok"),
        F.count("bad_cast").alias("n_cast_ok"),
        F.count("first_el").alias("n_first"),
        F.count("oob_el").alias("n_oob"),
    )


# ---------------------------------------------------------------------------
# NULL-semantics audit (three-valued logic surface, pinned cross-engine)
# ---------------------------------------------------------------------------
@register(
    "q_null_semantics",
    oracle="""
    WITH src AS (
      SELECT NULLIF(l_returnflag, 'N') AS flag_n,
             NULLIF(l_linenumber, 1) AS ln_n,
             l_quantity
      FROM lineitem
    )
    SELECT COALESCE(flag_n, '<null>') AS flag_group,
           COUNT(*) AS n_rows,
           COUNT(flag_n) AS n_flag_nonnull,
           COUNT(ln_n) AS n_ln_nonnull,
           COUNT(DISTINCT ln_n) AS n_ln_distinct,
           CAST(SUM(CASE WHEN ln_n IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ln_nullsafe_null,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM src GROUP BY flag_n
    """,
    tags=("relational", "functions", "semantics"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface, pinned: NULLIF manufactures NULLs from
    real columns, GROUP BY collects the NULL group as one group (per
    standard SQL), COUNT(col) skips NULLs while COUNT(*) does not,
    COUNT(DISTINCT) excludes NULL from the domain, and the null-safe
    equality operator (<=> in Spark, IS NOT DISTINCT FROM in DuckDB)
    treats NULL = NULL as TRUE where plain `=` yields UNKNOWN. These are
    the semantics every outer-join/dirty-data pipeline silently relies
    on; one engineered projection + one aggregate makes the whole
    contract hash-checkable."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_n"),
        F.nullif(F.col("l_linenumber"), F.lit(1)).alias("ln_n"),
        "l_quantity",
    )
    return src.groupBy("flag_n").agg(
        F.count("*").alias("n_rows"),
        F.count("flag_n").alias("n_flag_nonnull"),
        F.count("ln_n").alias("n_ln_nonnull"),
        F.countDistinct("ln_n").alias("n_ln_distinct"),
        F.sum(
            F.when(F.expr("ln_n <=> NULL"), 1).otherwise(0)
        ).cast("long").alias("n_ln_nullsafe_null"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    ).select(
        F.coalesce(F.col("flag_n"), F.lit("<null>")).alias("flag_group"),
        "n_rows",
        "n_flag_nonnull",
        "n_ln_nonnull",
        "n_ln_distinct",
        "n_ln_nullsafe_null",
        "sum_qty",
    )

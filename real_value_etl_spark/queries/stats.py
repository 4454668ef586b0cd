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

from pyspark.sql import DataFrame, SparkSession, Window
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
    and KLL approximate percentiles (single pass, no sort).

    The three quantiles are returned as SCALAR columns (`element_at` over
    the one sketch result), not as an `array<double>` — the driver's
    rows-only canonicalizer sorts rows via pandas and cannot hash list
    cells (r3 VERDICT weak item #1). One sketch is still built per group;
    splitting happens after the aggregate, so cost is unchanged."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10_000).alias(
            "_pq"
        ),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "approx_parts",
        F.element_at("_pq", 1).alias("p50_price"),
        F.element_at("_pq", 2).alias("p95_price"),
        F.element_at("_pq", 3).alias("p99_price"),
        "n",
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


# ---------------------------------------------------------------------------
# Ranking-distribution windows: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------
@register(
    "q_ntile_deciles",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority,
             NTILE(10) OVER win AS decile,
             PERCENT_RANK() OVER win AS pct_rank,
             CUME_DIST() OVER win AS cume,
             o_totalprice
      FROM orders
      WINDOW win AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderpriority, decile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo_price,
           MAX(o_totalprice) AS hi_price,
           MAX(pct_rank) AS max_pct_rank,
           MAX(cume) AS max_cume
    FROM w GROUP BY 1, 2
    """,
    tags=("window", "ranking", "agg"),
)
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment + distribution ranks per order priority.

    o_orderpriority has FIVE distinct values — a window PARTITION BY on
    it funnels ~N/5 rows through each of five tasks, the same
    one-reducer shape as a global window, just five-wide (the 100 TB
    hazard class VERDICT r4 flagged for the global NTILE pair). All
    three ranking functions are therefore derived ARITHMETICALLY from
    one two-phase per-group rank (operators/scan.py:grouped_rank_stats —
    groups span range partitions; offsets come from a tiny
    per-(group, partition) count frame, windows over it partitioned BY
    GROUP, so no single-partition exchange exists at all): ntile via the
    bucket formula, percent_rank = (r-1)/(N-1), cume_dist = r/N — exact
    because the o_orderkey tiebreak makes the in-group order total.
    Integer-ratio doubles are the same IEEE divisions both engines
    compute, so values hash-match the oracle's window form."""
    from ..operators.scan import grouped_rank_stats, ntile_from_rank

    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    stats = grouped_rank_stats(
        o,
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        rank_col="r",
        n_col="n",
    )
    r, n = F.col("r"), F.col("n")
    w = stats.select(
        "o_orderpriority",
        ntile_from_rank(r, n, 10).alias("decile"),
        F.when(n == 1, F.lit(0.0))
        .otherwise((r - 1).cast("double") / (n - 1).cast("double"))
        .alias("pct_rank"),
        (r.cast("double") / n.cast("double")).alias("cume"),
        "o_totalprice",
    )
    return w.groupBy("o_orderpriority", "decile").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("lo_price"),
        F.max("o_totalprice").alias("hi_price"),
        F.max("pct_rank").alias("max_pct_rank"),
        F.max("cume").alias("max_cume"),
    )


# ---------------------------------------------------------------------------
# Exact correlation from decimal sums (built-in corr is order-sensitive)
# ---------------------------------------------------------------------------
@register(
    "q_corr_qty_price",
    oracle="""
    WITH s AS (
      -- decimal -> double goes THROUGH VARCHAR: DuckDB's direct decimal
      -- cast is not correctly rounded once the unscaled digits exceed
      -- 2^53 (observed: syy at sf0.1 landed 1 ulp low), while its
      -- strtod and Spark/Java BigDecimal.doubleValue are both correctly
      -- rounded -- the r10 latent-divergence class
      SELECT COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT n,
           ((n * sxy) - (sx * sy)) AS cov_num,
           (((n * sxy) - (sx * sy))
            / (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy))))
             AS corr_qty_price
    FROM s
    """,
    tags=("agg", "stats", "correlation"),
)
def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation computed from exact decimal sums (n, Σx, Σy,
    Σx², Σy², Σxy) — order-independent, hence bit-exact across engines,
    unlike the built-in streaming corr whose accumulation order differs.
    One partial+final agg pass over lineitem; the final arithmetic is six
    IEEE ops on identical doubles."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    den = F.sqrt((F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))) * F.sqrt(
        (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    )
    return s.select("n", num.alias("cov_num"), (num / den).alias("corr_qty_price"))


# ---------------------------------------------------------------------------
# Equi-depth binning (quantile bucketing)
# ---------------------------------------------------------------------------
_ED_FRACS = [i / 10 for i in range(1, 10)]  # deciles: 9 inner edges


@register(
    "q_equidepth_price",
    oracle=f"""
    WITH edges AS (
      SELECT quantile_cont(l_extendedprice,
                           {_ED_FRACS}) AS qs
      FROM lineitem
    )
    SELECT 1 + len(list_filter(e.qs, q -> q < l.l_extendedprice)) AS bin,
           COUNT(*) AS n_rows,
           MIN(l.l_extendedprice) AS lo,
           MAX(l.l_extendedprice) AS hi
    FROM lineitem l, edges e
    GROUP BY 1
    """,
    tags=("stats", "agg", "binning"),
)
def q_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of l_extendedprice into deciles: one
    tiny exact-percentile aggregate computes the 9 inner edges, broadcast
    back onto the scan; each row's bin is 1 + (# edges strictly below it)
    — a pure array fold, no per-row join or sort. Exact `percentile` and
    DuckDB `quantile_cont` are bit-identical, so bin boundaries agree.
    The ML-side use is feature bucketization/winsorization at corpus
    scale; the two-pass plan (stats then bin) is the scalable shape."""
    li = table(spark, sf_dir, "lineitem")
    edges = li.agg(
        F.expr(f"percentile(l_extendedprice, array({','.join(map(str, _ED_FRACS))}))").alias("qs")
    )
    return (
        li.crossJoin(F.broadcast(edges))
        .select(
            (1 + F.size(F.filter("qs", lambda q: q < F.col("l_extendedprice"))))
            .alias("bin"),
            "l_extendedprice",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD z-scores per user)
# ---------------------------------------------------------------------------
@register(
    "events_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ), mad AS (
      SELECT e.user_id, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (user_id)
      GROUP BY e.user_id, m.med
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (user_id)
    GROUP BY e.user_id
    """,
    tags=("events", "stats", "outliers"),
)
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier counts via median absolute deviation:
    mean/stddev z-scores break under the very outliers they hunt; median
    and MAD are 50%-breakdown robust. Two grouped exact-percentile passes
    share the user_id shuffle, stats rejoin the rows broadcast (150-15k
    distinct users). Exact percentile == quantile_cont bit-for-bit, and
    |x - med| > 3*MAD compares identically derived doubles — no float
    drift between engines."""
    ev = table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(F.expr("percentile(value, 0.5)").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "user_id")
        .groupBy("user_id", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1)
                .otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Join-size estimation by key sampling (the CBO-style cardinality probe)
# ---------------------------------------------------------------------------
JSE_MOD = 100
JSE_PCT = 5  # sample keys whose portable hash lands in [0, 5) of 100


@register(
    "q_join_size_estimate",
    oracle=f"""
    WITH lk AS (
      SELECT l_orderkey AS k FROM lineitem
      WHERE CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))
                 AS BIGINT) % {JSE_MOD} < {JSE_PCT}
    ),
    ok AS (
      SELECT o_orderkey AS k FROM orders
      WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                 AS BIGINT) % {JSE_MOD} < {JSE_PCT}
    ),
    s AS (SELECT COUNT(*) AS sample_out FROM lk JOIN ok USING (k)),
    a AS (SELECT COUNT(*) AS actual_out
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT s.sample_out,
           s.sample_out * {JSE_MOD // JSE_PCT} AS est_out,
           a.actual_out,
           CAST(s.sample_out * {JSE_MOD // JSE_PCT} AS DOUBLE) / a.actual_out
             AS est_ratio
    FROM s, a
    """,
    tags=("stats", "join", "sampling", "cbo"),
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by KEY-SYNCHRONIZED sampling — the
    probe a cost-based optimizer (or a capacity planner) runs before
    committing to a join order: hash-sample {JSE_PCT}% of the JOIN KEY
    SPACE on BOTH sides (the same keys survive on both sides because the
    hash is of the key, not the row — per-row sampling would
    underestimate by the sample rate squared), join the samples, and
    scale by 1/rate. Deterministic portable hash => the estimate itself
    is hash-checkable, and the query also reports the actual join count
    and the achieved est/actual ratio. At 100 TB the sample join touches
    ~{JSE_PCT}% of each side with the filter pushed to the scans."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")

    def keep(col):
        from ..functions.text import portable_hash32

        return (portable_hash32(col.cast("string")) % JSE_MOD) < JSE_PCT

    lk = li.filter(keep(F.col("l_orderkey"))).select(
        F.col("l_orderkey").alias("k")
    )
    ok = orders.filter(keep(F.col("o_orderkey"))).select(
        F.col("o_orderkey").alias("k")
    )
    s = lk.join(ok, "k").agg(F.count("*").alias("sample_out"))
    a = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("actual_out"))
    )
    return (
        s.crossJoin(F.broadcast(a))
        .select(
            "sample_out",
            (F.col("sample_out") * (JSE_MOD // JSE_PCT)).alias("est_out"),
            "actual_out",
            (
                (F.col("sample_out") * (JSE_MOD // JSE_PCT)).cast("double")
                / F.col("actual_out")
            ).alias("est_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew report (the pre-join diagnosis for salting / AQE decisions)
# ---------------------------------------------------------------------------
@register(
    "q_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey AS k, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ),
    top_key AS (
      SELECT k, cnt FROM (
        SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS r
        FROM per_key) WHERE r = 1
    )
    SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM per_key) AS n_rows,
           (SELECT COUNT(*) FROM per_key) AS n_keys,
           t.cnt AS max_per_key,
           CAST((SELECT CAST(SUM(cnt) AS BIGINT) FROM per_key) AS DOUBLE)
             / (SELECT COUNT(*) FROM per_key) AS avg_per_key,
           CAST(t.cnt AS DOUBLE)
             / (CAST((SELECT CAST(SUM(cnt) AS BIGINT) FROM per_key) AS DOUBLE)
                / (SELECT COUNT(*) FROM per_key)) AS skew_factor,
           t.k AS heaviest_key
    FROM top_key t
    """,
    tags=("stats", "skew", "diagnosis"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for lineitem.l_orderkey — the audit run
    BEFORE a big join to decide whether salting (operators/skew.py) or
    AQE skew-split is needed: per-key counts, the heaviest key
    (deterministic tiebreak: lowest key), and the skew factor
    max/avg. One map-side-combined aggregation over the fact table; the
    per-key table reduces to a single summary row — nothing about this
    query grows with corpus size except the one groupBy."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("cnt")
    )
    summary = per_key.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_per_key"),
        F.max_by(
            F.struct(F.col("cnt"), (-F.col("k")).alias("nk")), F.struct(F.col("cnt"), (-F.col("k")).alias("nk"))
        ).alias("top"),
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys")
    return summary.select(
        "n_rows",
        "n_keys",
        "max_per_key",
        avg.alias("avg_per_key"),
        (F.col("max_per_key").cast("double") / avg).alias("skew_factor"),
        (-F.col("top.nk")).alias("heaviest_key"),
    )


# ---------------------------------------------------------------------------
# Salted two-stage aggregation (the skew-kill GROUP BY, oracle-checked)
# ---------------------------------------------------------------------------
SALT_BUCKETS = 8


@register(
    "q_salted_hot_key_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "diagnosis"),
)
def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-proof GROUP BY: lineitem has only 3 return flags, so a
    plain groupBy lands the whole table on 3 reduce tasks — exactly the
    hot-key shape AQE cannot split (a single group is indivisible).
    `salted_agg` spreads each group over {SALT_BUCKETS} deterministic
    salt buckets (hash of the orderkey, not rand() — reruns and oracles
    stay stable), merges the tiny per-salt partials in a second
    aggregate, and — because the partial sums are decimal — the result
    is BIT-IDENTICAL to the single-stage plan the oracle runs: the
    regrouping is invisible in the values, visible only in the task
    histogram. This is the registered proof that the skew operator is
    lossless, not just plausible (operators/skew.py)."""
    from ..operators.skew import salted_agg

    li = table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        uniqueifier="l_orderkey",
        buckets=SALT_BUCKETS,
        sums={"l_quantity": "sum_qty", "l_extendedprice": "sum_price"},
        count_alias="n",
    )


# ---------------------------------------------------------------------------
# Discrete (WITHIN GROUP) percentiles — the order-statistics twin of _cont
# ---------------------------------------------------------------------------
@register(
    "q_percentile_disc",
    oracle="""
    SELECT l_linestatus,
           quantile_disc(l_extendedprice, 0.25) AS p25,
           quantile_disc(l_extendedprice, 0.50) AS p50,
           quantile_disc(l_extendedprice, 0.90) AS p90,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (WITHIN GROUP ordered-set aggregates): the
    returned value is an actual member of the group — what
    "p90 document length" should report when the consumer feeds it back
    as a filter bound (an interpolated _cont value may match no row).
    Registered through the SQL-text path since the ordered-set syntax is
    SQL-only; exact agreement with DuckDB's quantile_disc needs no
    epsilon because both pick the same order statistic."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__pd_lineitem")
    return spark.sql(
        """
        SELECT l_linestatus,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS p50,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS p90,
               COUNT(*) AS n
        FROM __pd_lineitem GROUP BY l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier): non-dominated parts on (retailprice, size)
# ---------------------------------------------------------------------------
@register(
    "q_skyline_parts",
    oracle="""
    SELECT a.p_partkey, a.p_retailprice, CAST(a.p_size AS BIGINT) AS p_size
    FROM part a WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
    tags=("stats", "skyline", "window"),
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: parts not dominated on
    (minimize retailprice, minimize size) — the multi-objective
    "best offers" operator (Borzsony et al., ICDE'01). The oracle is the
    NOT EXISTS definition; the Spark plan is the scalable TWO-PHASE
    sort-filter reduction, never the O(n^2) self-join:

    1. distinct (price, size) points, each partition computes its LOCAL
       skyline with a running-min window over (price asc, size asc) —
       a preceding row dominates iff its size <= current (strictly
       cheaper ties included by the sort order), so
       `min(size) over preceding < size + 1` detects dominance with
       one window; identical points are merged first so same-point
       self-domination can't fire;
    2. only local survivors meet in one global window that applies the
       same test. Phase 1 removes a point only when a true dominator
       shares its partition; a GLOBAL frontier point has no dominator
       anywhere, so it always survives to phase 2 — the reduction is
       exact, and the global window sees only the per-partition
       frontiers (typically << n);
    3. frontier points broadcast back onto the part table to emit the
       full rows.

    At 100 TB phase 1 runs fully parallel on whatever partitioning the
    scan delivers and phase 2 touches only the per-partition frontiers."""
    p = table(spark, sf_dir, "part")
    pts = p.select("p_retailprice", "p_size").distinct()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.asc("p_retailprice"), F.asc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        pts.withColumn("__pid", F.spark_partition_id())
        .withColumn("__pm", F.min("p_size").over(w_local))
        .filter(F.col("__pm").isNull() | (F.col("__pm") > F.col("p_size")))
        .select("p_retailprice", "p_size")
    )
    w_glob = (
        Window.orderBy(F.asc("p_retailprice"), F.asc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        local.withColumn("__gm", F.min("p_size").over(w_glob))
        .filter(F.col("__gm").isNull() | (F.col("__gm") > F.col("p_size")))
        .select("p_retailprice", "p_size")
    )
    return p.join(
        F.broadcast(frontier), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_retailprice", F.col("p_size").cast("long"))


# ---------------------------------------------------------------------------
# Exact weighted median (quantity-weighted price) per return flag
# ---------------------------------------------------------------------------
@register(
    "q_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice
                                   ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS total_w
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MAX(total_w) AS DOUBLE) AS total_weight,
           MIN(l_extendedprice) FILTER (WHERE 2 * cumw >= total_w)
             AS weighted_median
    FROM cum GROUP BY l_returnflag
    """,
    tags=("stats", "window", "percentile"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (lower) median: the quantity-weighted median
    extended price per return flag — the first price whose cumulative
    weight reaches half the group total, computed as MIN(price) over the
    qualifying suffix of the cumulative sum. Ties need no explicit
    tiebreak: the LAST row of an equal-price run has an
    order-independent cumulative weight, so wherever the half-total
    crossing lands inside the run, the run's price qualifies and MIN
    over the suffix returns it. All arithmetic is exact DECIMAL.

    Scale shape: a per-group window would funnel ~N/3 rows through one
    task per return flag (the hazard class the ntile family escapes),
    so the cumulative sum is the TWO-PHASE global running sum
    (operators/scan.py) over the total order (flag, price, orderkey,
    linenumber); each group's own prefix is recovered by subtracting
    the cumulative total of EARLIER groups — a 3-row broadcast frame.
    No task ever sees more than a range-partition of rows."""
    from ..operators.scan import global_running_sum

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    )
    order_cols = [
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    ]
    gsum = global_running_sum(
        li, order_cols, "l_quantity", out_col="g_cum"
    )
    group_tot = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("total_w")
    )
    w_prev = Window.orderBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = group_tot.select(
        "l_returnflag",
        "total_w",
        F.coalesce(
            F.sum("total_w").over(w_prev), F.lit(0).cast("decimal(38,2)")
        ).alias("prev_w"),
    )
    cum = gsum.join(F.broadcast(offsets), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("g_cum") - F.col("prev_w")).alias("cumw"),
        "total_w",
    )
    return cum.groupBy("l_returnflag").agg(
        # exact decimal MAX, then DOUBLE for OUTPUT (repo convention,
        # relational.py:16): a DecimalType output column hashes as
        # "506627.00" on the Spark side vs DuckDB-pandas float "506627.0"
        # — the r8 driver-red. Sum of integral quantities < 2^53, exact.
        F.max("total_w").cast("double").alias("total_weight"),
        F.min(
            F.when(
                F.lit(2) * F.col("cumw") >= F.col("total_w"),
                F.col("l_extendedprice"),
            )
        ).alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue concentration
# ---------------------------------------------------------------------------
@register(
    "q_gini_revenue",
    oracle="""
    WITH rev AS (
      -- exact decimal accumulate (the _dsum pattern): SUM over the raw
      -- DOUBLE is accumulation-order-dependent and diverged at sf0.1
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT revenue,
             ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i
      FROM rev
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(revenue) AS total,
             SUM(i * revenue) AS weighted
      FROM ranked
    )
    -- decimal -> double via VARCHAR (r10 class: DuckDB's direct cast
    -- mis-rounds once unscaled digits exceed 2^53; weighted does at sf0.1)
    SELECT n,
           CAST(CAST(total AS VARCHAR) AS DOUBLE) AS total_revenue,
           (2.0 * (CAST(CAST(weighted AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(total AS VARCHAR) AS DOUBLE))
            - CAST(n + 1 AS DOUBLE)) / CAST(n AS DOUBLE) AS gini
    FROM sums
    """,
    tags=("stats", "window", "concentration"),
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality audit behind "top-1% of customers drive X%" claims:
    G = (2·Σ i·x_(i) / (n·Σx)) - (n+1)/n over revenues sorted ascending.
    The global rank i comes from the TWO-PHASE row number
    (operators/scan.py), so no single task ever sorts the whole
    customer set; revenue, Σ i·x and Σx are exact DECIMAL sums
    (order-free — the raw-double SUM diverged at sf0.1, r10 find), and
    the Gini itself is three pinned double ops at the very end — the
    only non-exact step, identical textual shape on both engines.
    Ties in revenue break on custkey so the rank (and hence Σ i·x) is
    total and deterministic."""
    from ..operators.scan import global_row_number

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        # exact decimal accumulate (_dsum pattern): the raw-double SUM is
        # accumulation-order-dependent and diverged at sf0.1 (r10 find)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    ranked = global_row_number(
        rev, ["revenue", "o_custkey"], out_col="i"
    ).drop("__n")
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum("revenue").alias("total"),
        F.sum(F.col("i") * F.col("revenue")).alias("weighted"),
    )
    gini = (
        F.lit(2.0) * (F.col("weighted").cast("double") / F.col("total").cast("double"))
        - (F.col("n") + 1).cast("double")
    ) / F.col("n").cast("double")
    return sums.select(
        "n",
        # exact decimal SUM upstream; DOUBLE for OUTPUT (never DecimalType
        # in a result schema — r8 driver-red class; cents < 2^53, exact)
        F.col("total").cast("double").alias("total_revenue"),
        gini.alias("gini"),
    )


# ---------------------------------------------------------------------------
# Priority sampling (Duffield et al.): weight-aware sample + HT sum estimate
# ---------------------------------------------------------------------------
PRIO_K = 100
_PRIO_HASH_SPACE = float(1 << 32)


@register(
    "q_priority_sample_sum",
    oracle=f"""
    WITH pri AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS w,
             CAST(o_totalprice AS DOUBLE)
               / ((CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                            1, 8)) AS BIGINT) + 1)
                  / {_PRIO_HASH_SPACE!r}) AS priority
      FROM orders
    ),
    top AS (
      SELECT o_orderkey, w, priority,
             ROW_NUMBER() OVER (ORDER BY priority DESC, o_orderkey) AS rnk
      FROM (SELECT * FROM pri
            ORDER BY priority DESC, o_orderkey LIMIT {PRIO_K + 1})
    ),
    tau AS (SELECT priority AS t FROM top WHERE rnk = {PRIO_K + 1}),
    est AS (
      SELECT COUNT(*) AS k,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(CASE WHEN w > t THEN w ELSE t END ORDER BY o_orderkey)),
               (acc, x) -> acc + x) AS est_total
      FROM top CROSS JOIN tau WHERE rnk <= {PRIO_K}
    ),
    exact AS (SELECT CAST(SUM(o_totalprice) AS DOUBLE) AS exact_total
              FROM orders)
    SELECT e.k, t.t AS tau, e.est_total, x.exact_total
    FROM est e CROSS JOIN tau t CROSS JOIN exact x
    """,
    tags=("stats", "sampling", "sketch"),
)
def q_priority_sample_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): a {PRIO_K}-row
    weight-aware sample of orders with the unbiased Horvitz-Thompson
    total estimate — the "estimate SUM from k rows" primitive for
    dashboards over 100 TB facts. Priority = w / u with u the
    (0,1]-uniform from the portable md5 hash of the key; the sample is
    the top-k by priority, tau the (k+1)-th, and the estimate
    sums max(w, tau) over the sample. Fully deterministic: the "random"
    u is the shared hash, the top-k is TakeOrderedAndProject (no global
    sort materializes), the rank inside the (k+1)-row frame is a
    bounded window, and the 100-double estimate sum is an ORDERED fold
    (key order) so both engines add in the same sequence. The exact
    total rides along (exact DECIMAL) to exhibit the estimator error.
    The one non-obvious double step — w / (h+1)/2^32 — is the same two
    IEEE divisions on both sides."""
    from ..functions.text import portable_hash32

    o = table(spark, sf_dir, "orders")
    w = F.col("o_totalprice").cast("double")
    u = (portable_hash32(F.col("o_orderkey").cast("string")) + 1) / F.lit(
        _PRIO_HASH_SPACE
    )
    pri = o.select(
        "o_orderkey", w.alias("w"), (w / u).alias("priority")
    )
    top = (
        pri.orderBy(F.desc("priority"), F.asc("o_orderkey"))
        .limit(PRIO_K + 1)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("priority"), F.asc("o_orderkey"))
            ),
        )
    )
    tau = top.filter(F.col("rnk") == PRIO_K + 1).select(
        F.col("priority").alias("t")
    )
    est = (
        top.filter(F.col("rnk") <= PRIO_K)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.count("*").alias("k"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "o_orderkey",
                            F.when(F.col("w") > F.col("t"), F.col("w"))
                            .otherwise(F.col("t"))
                            .alias("v"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["v"],
            ).alias("est_total"),
        )
    )
    exact = o.agg(
        # exact decimal SUM, DOUBLE output (r8 driver-red class; the sf0.01
        # total 3,758,439,620.06 = 375,843,962,006 cents < 2^53, exact)
        F.sum("o_totalprice").cast("double").alias("exact_total")
    )
    return est.crossJoin(F.broadcast(tau)).crossJoin(
        F.broadcast(exact)
    ).select("k", F.col("t").alias("tau"), "est_total", "exact_total")


HDR_SUB_BITS = 2  # 4 sub-buckets per power of two (HdrHistogram-style)


@register(
    "q_hdr_histogram_price",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS c
      FROM orders
    ),
    cells AS (
      SELECT length(bin(c)) AS b,
             CASE WHEN length(bin(c)) <= {HDR_SUB_BITS}
                  THEN 0
                  ELSE (c // (1::BIGINT << (length(bin(c)) - {HDR_SUB_BITS + 1})))
                       - {1 << HDR_SUB_BITS} END AS sub,
             c
      FROM cents
    ),
    agg AS (
      SELECT b, sub, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(c) AS BIGINT) AS min_cents,
             CAST(MAX(c) AS BIGINT) AS max_cents
      FROM cells GROUP BY b, sub
    )
    SELECT b, sub, n, min_cents, max_cents,
           CAST(CASE WHEN b <= {HDR_SUB_BITS} THEN (1::BIGINT << (b - 1))
                ELSE ({1 << HDR_SUB_BITS} + sub)
                     << (b - {HDR_SUB_BITS + 1}) END AS BIGINT) AS cell_lo,
           CAST(SUM(n) OVER (ORDER BY b, sub) AS BIGINT) AS cum_n
    FROM agg
    """,
    tags=("stats", "aggregation", "histogram"),
)
def q_hdr_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL (HdrHistogram-style) value histogram of order totals
    in integer cents: bucket = bit length of the value (a power-of-two
    decade), sub-bucket = the next {HDR_SUB_BITS} bits — constant
    relative precision (~{100 // (1 << HDR_SUB_BITS)}% per cell) across
    nine orders of magnitude with at most 64 x {1 << HDR_SUB_BITS}
    cells, the structure latency/price monitoring uses where equi-width
    histograms (q_histogram_totalprice) waste all their cells on one
    decade. ENTIRELY log-free: bit length is length(bin(x)) and the
    sub-bucket is a data-dependent right-shift — exact integers on both
    engines, no float log2 to drift. The map side emits (b, sub) — a
    map-side-combinable {'<='}256-cell aggregate at any scale; the
    cumulative count runs on the bounded cell frame (waived
    single-partition window over {'<='}256 rows)."""
    o = table(spark, sf_dir, "orders")
    cents = o.select(
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("c")
    )
    b = F.length(F.bin(F.col("c")))
    sub = F.when(b <= HDR_SUB_BITS, F.lit(0)).otherwise(
        F.expr(
            # BIGINT shift base (r8 ADVICE): with an INT literal the shift
            # amount wraps mod 32, so a value >= 2^34 cents (b >= 35)
            # would bucket differently here than in DuckDB's 64-bit <<
            f"(c div shiftleft(CAST(1 AS BIGINT),"
            f" length(bin(c)) - {HDR_SUB_BITS + 1})) - {1 << HDR_SUB_BITS}"
        )
    )
    agg = (
        cents.select(b.alias("b"), sub.alias("sub"), "c")
        .groupBy("b", "sub")
        .agg(
            F.count("*").alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )
    cell_lo = F.when(
        F.col("b") <= HDR_SUB_BITS,
        F.expr("shiftleft(CAST(1 AS BIGINT), b - 1)"),
    ).otherwise(
        F.expr(
            f"shiftleft(CAST({(1 << HDR_SUB_BITS)} + sub AS BIGINT),"
            f" b - {HDR_SUB_BITS + 1})"
        )
    )
    w = Window.orderBy("b", "sub").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "b",
        "sub",
        "n",
        "min_cents",
        "max_cents",
        cell_lo.cast("long").alias("cell_lo"),
        F.sum("n").over(w).alias("cum_n"),
    )


# ---------------------------------------------------------------------------
# Bitmap-index set intersection (packed 64-bit words — the roaring-style
# primitive behind bitmap indexes and audience-overlap engines)
# ---------------------------------------------------------------------------
@register(
    "q_bitmap_intersect",
    oracle="""
    WITH bm AS (
      SELECT event_type, user_id // 63 AS word,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS w
      FROM events GROUP BY 1, 2
    ),
    sizes AS (
      SELECT event_type, CAST(SUM(bit_count(w)) AS BIGINT) AS n
      FROM bm GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(SUM(bit_count(a.w & b.w)) AS BIGINT) AS n_intersect
      FROM bm a JOIN bm b
        ON b.word = a.word AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_intersect,
           sa.n + sb.n - i.n_intersect AS n_union,
           CAST(i.n_intersect AS DOUBLE)
             / (sa.n + sb.n - i.n_intersect) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
    tags=("aggregation", "set", "bitmap"),
)
def q_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience overlap via a PACKED-BITMAP INDEX: each event
    type's user set becomes one packed word per 63-id block (bit i of
    word k set iff user 63k+i appeared; 63 bits per word, not 64,
    because DuckDB's checked << rejects shifting into the sign bit
    while Spark's shiftleft silently wraps there — the one-bit haircut
    keeps the arithmetic identical and overflow-free on both engines), then every pair's intersection
    and union are BITWISE AND/popcount arithmetic over co-located words
    — the roaring-bitmap primitive OLAP engines use for segment-overlap
    and audience queries, here in pure Catalyst expressions. Three
    properties make it the scale answer to "how many users do segments
    share": (1) bit_or ABSORBS duplicates, so the raw event stream
    feeds the build directly — no distinct-users shuffle ever happens;
    (2) the bitmap is 1 bit per possible id instead of 8+ bytes per
    observed id, and blocks with no members never exist (sparse by
    construction); (3) the pair join is an equi-join on the block id —
    only co-populated blocks meet, and |types|^2 stays in the group-by
    key, never in the data. Distinct counts fall out for free
    (popcount of the own-bitmap), and exactness is unit-verified
    against plain set arithmetic. All integers except the final
    Jaccard division (pinned shape both engines).

    At 100 TB: the build is ONE map-side-combinable aggregate on
    (type, block); for sparse/64-bit id spaces, hash ids into a dense
    surrogate domain first (the standard bitmap-index prep) — the
    operator is unchanged. Reference basis: SURVEY.md §2.4 aggregation
    family (absent in reference)."""
    ev = table(spark, sf_dir, "events")
    bm = (
        ev.select(
            "event_type",
            F.expr("user_id div 63").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("b"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(b)").alias("w"))
    )
    sizes = bm.groupBy("event_type").agg(
        F.sum(F.expr("CAST(bit_count(w) AS BIGINT)")).alias("n")
    )
    a = bm.select(
        F.col("event_type").alias("type_a"),
        "word",
        F.col("w").alias("wa"),
    )
    b = bm.select(
        F.col("event_type").alias("type_b"),
        F.col("word").alias("word_b"),
        F.col("w").alias("wb"),
    )
    inter = (
        a.join(
            b,
            (F.col("word") == F.col("word_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.expr("CAST(bit_count(wa & wb) AS BIGINT)")
            ).alias("n_intersect")
        )
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_intersect",
            (F.col("n_a") + F.col("n_b") - F.col("n_intersect")).alias(
                "n_union"
            ),
            (
                F.col("n_intersect").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_intersect"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (chi-square cells vs the Benford law literals)
# ---------------------------------------------------------------------------
# round(log10(1 + 1/d) * 1e9) for d = 1..9 — fixed published constants
# embedded as the SAME integer literals in both engines (the
# codebook-literal pattern: no log() ever crosses an engine boundary,
# per the repo's cross-engine log doctrine).
BENFORD_P9 = [
    301029996, 176091259, 124938737, 96910013, 79181246,
    66946790, 57991947, 51152522, 45757491,
]
BENFORD_S = 10**9  # the literals' fixed-point scale


@register(
    "q_benford_audit",
    oracle=f"""
    WITH oc AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM oc),
    spine AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit),
    cells AS (
      SELECT s.digit,
             COALESCE(oc.o, 0) AS n_obs,
             t.n,
             CAST({BENFORD_P9} AS BIGINT[])[CAST(s.digit AS INTEGER)] AS ps
      FROM spine s
      LEFT JOIN oc ON oc.digit = s.digit
      CROSS JOIN tot t
    ),
    dev AS (
      SELECT digit, n_obs, n, ps,
             CAST({BENFORD_S} AS HUGEINT) * n_obs
               - CAST(n AS HUGEINT) * ps AS d
      FROM cells
    )
    SELECT digit,
           n_obs,
           n AS n_orders,
           CAST(d AS BIGINT) AS dev_scaled,
           CAST(ps AS DOUBLE) / {BENFORD_S}.0 AS benford_p,
           CAST(CAST(d * d AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST({BENFORD_S} AS HUGEINT) * n * ps AS VARCHAR)
                    AS DOUBLE) AS chi2_contrib
    FROM dev
    """,
    tags=("stats", "audit"),
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit of order totals — the classic
    fabricated-numbers screen (expense fraud, synthetic-data tells):
    the observed first-significant-digit histogram against the Benford
    expectation P(d) = log10(1 + 1/d), one chi-square cell per digit.
    The log constants are fixed PUBLISHED integers at scale 1e9 (the
    codebook-literal pattern — no engine ever evaluates a log), the
    first digit comes from the EXACT integer part (floor of the double
    is exact in IEEE, so no decimal-rounding boundary can flip 999.995
    into a different leading digit across engines), zero-observation
    digits are spine-filled (a missing cell deviates by its full
    expectation — dropping it understates the statistic), and each
    cell's deviation S*O_d - n*P_d is EXACT DECIMAL(38,0) arithmetic
    (HUGEINT in the oracle; the EMITTED dev column is BIGINT — exact
    through ~9e9 orders, widen to string-rendered decimals beyond). The per-cell chi2 contribution is the one double
    division, its operands converted via the VARCHAR doctrine
    (COVERAGE.md r10: decimal->double above 2^53 goes through strings,
    where both engines round correctly). Cross-row double sums are
    deliberately NOT emitted — consumers rank cells by |dev_scaled|,
    which is exact.

    Scale shape: ONE map-side-combinable 9-cell digit count, a 9-row
    spine join — nothing after the first aggregate is data-sized.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    oc = o.groupBy(digit.alias("digit")).agg(F.count("*").alias("o"))
    tot = oc.agg(F.sum("o").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    ps = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P9]), F.col("digit").cast("int")
    )
    cells = (
        spine.join(F.broadcast(oc), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("o"), F.lit(0)).alias("n_obs"),
            "n",
            ps.alias("ps"),
        )
    )
    d = (
        F.lit(BENFORD_S).cast("decimal(38,0)") * F.col("n_obs")
        - F.col("n").cast("decimal(38,0)") * F.col("ps")
    )
    den = (
        F.lit(BENFORD_S).cast("decimal(38,0)")
        * F.col("n").cast("decimal(38,0)")
        * F.col("ps").cast("decimal(38,0)")
    )
    return cells.select(
        "digit",
        "n_obs",
        F.col("n").alias("n_orders"),
        d.cast("long").alias("dev_scaled"),
        (F.col("ps").cast("double") / F.lit(float(BENFORD_S))).alias(
            "benford_p"
        ),
        (
            (d * d).cast("decimal(38,0)").cast("double")
            / den.cast("double")
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# Hoover (Robin Hood) index of customer revenue concentration
# ---------------------------------------------------------------------------
@register(
    "q_hoover_index",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM cust
    ),
    dev AS (
      SELECT CAST(SUM(ABS(c.cents * t.n - t.total_cents)) AS BIGINT)
               AS hoover_num
      FROM cust c CROSS JOIN tot t
    )
    SELECT t.n AS n_customers, t.total_cents, d.hoover_num,
           CAST(d.hoover_num AS DOUBLE) / (2.0 * t.n * t.total_cents)
             AS hoover
    FROM tot t CROSS JOIN dev d
    """,
    tags=("stats", "inequality"),
)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOOVER (Robin Hood) INDEX of revenue concentration across
    customers — the fraction of total revenue that would have to move
    between customers to equalize them, the L1 complement of
    q_gini_revenue's L-curve view (Hoover is the max vertical gap to
    the line of equality; Gini the area): together they distinguish
    "mildly unequal everywhere" from "a few whales". H = sum|x_i/X -
    1/n| / 2 is RATIONAL in the exact per-customer cent totals:
    the numerator sum|n*x_i - X| is one exact BIGINT (cents * customer
    count: safe through ~9e13 total cents x 1e5 customers — widen to
    DECIMAL(38,0) beyond 2^63), and the index is ONE pinned double
    division by 2nX. No sort, no percentile machinery — unlike Gini,
    Hoover needs no rank, which is why it scales as a pure two-pass
    aggregate.

    Scale shape: ONE map-side-combinable per-customer cents rollup, a
    1-row (n, X) scalar broadcast back over the customer frame, and a
    second map-side-combinable |dev| reduce — customer-keyed shuffle
    only. Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    tot = cust.agg(
        F.count("*").alias("n"), F.sum("cents").alias("total_cents")
    )
    dev = (
        cust.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("cents") * F.col("n") - F.col("total_cents")
            ).alias("ad")
        )
        .agg(F.sum("ad").alias("hoover_num"))
    )
    return (
        tot.crossJoin(F.broadcast(dev))
        .select(
            F.col("n").alias("n_customers"),
            "total_cents",
            "hoover_num",
            (
                F.col("hoover_num").cast("double")
                / (F.lit(2.0) * F.col("n") * F.col("total_cents"))
            ).alias("hoover"),
        )
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index of customer revenue
# ---------------------------------------------------------------------------
@register(
    "q_hhi_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             SUM(CAST(cents AS HUGEINT) * cents) AS sq
      FROM cust
    )
    SELECT n AS n_customers, total_cents,
           CAST(CAST(sq AS VARCHAR) AS DOUBLE)
             / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
             * 10000.0 AS hhi,
           (CAST(CAST(sq AS VARCHAR) AS DOUBLE)
             / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
             * 10000.0 - 10000.0 / n)
             / (10000.0 - 10000.0 / n) AS hhi_normalized
    FROM agg
    """,
    tags=("stats", "inequality"),
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN INDEX of revenue concentration — the
    antitrust-standard sum of squared market shares (x10000, the
    regulator's scale: > 2500 = highly concentrated), completing the
    inequality trio next to q_gini_revenue (area view) and
    q_hoover_index (L1 view): HHI is the L2 view and the only one of
    the three that maps directly to an "effective number of players"
    (10000/HHI). The numerator sum(x_i^2) over exact cent totals
    EXCEEDS BIGINT at realistic scales (1e5 customers x (5e7 cents)^2
    ~ 2.5e20), so it is DECIMAL(38,0) on the Spark side and HUGEINT in
    the oracle, converted to DOUBLE THROUGH VARCHAR per the r10
    doctrine (direct decimal->double is not correctly rounded in
    DuckDB above 2^53); the index is then one multiply-divide chain
    with identical shape on both engines, and the normalized variant
    ((H - 1/n)/(1 - 1/n)) reuses the same rounded quotient.

    Scale shape: ONE map-side-combinable per-customer cents rollup and
    a 1-row moment reduce — nothing after the first aggregate is
    data-sized. Reference basis: SURVEY.md §2.4 stats family (absent
    in reference)."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    agg = cust.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("sq"),
    )
    hhi = (
        F.col("sq").cast("double")
        / (
            F.col("total_cents").cast("double")
            * F.col("total_cents").cast("double")
        )
        * F.lit(10000.0)
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        "total_cents",
        hhi.alias("hhi"),
        (
            (hhi - F.lit(10000.0) / F.col("n"))
            / (F.lit(10000.0) - F.lit(10000.0) / F.col("n"))
        ).alias("hhi_normalized"),
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test (exact D via integer cross-counts)
# ---------------------------------------------------------------------------
KS_PACK = 10**12  # cum-count packing base for the two-phase running sum:
# cum_hi * KS_PACK + cum_lo rides ONE decimal(38,0) prefix scan, so both
# ECDFs come out of a single range-partitioned pass. Exact while each
# side's cumulative count < 10^12 (the packed sum peaks at n_hi*10^12 +
# n_lo ~ 10^24 << 10^38); widen the base and the emitted BIGINTs to
# string-rendered decimals beyond ~10^12 rows per side.


@register(
    "q_ks_two_sample",
    oracle=f"""
    WITH pv AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(a) OVER (ORDER BY v) AS ca,
             SUM(b) OVER (ORDER BY v) AS cb
      FROM pv
    ),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2
      FROM pv
    ),
    dev AS (
      SELECT c.v,
             abs(CAST(c.ca AS HUGEINT) * t.n2
                 - CAST(c.cb AS HUGEINT) * t.n1) AS d,
             t.n1, t.n2
      FROM cum c CROSS JOIN tot t
    ),
    pick AS (
      SELECT n1, n2, CAST(d AS BIGINT) AS d_scaled, v AS witness_value
      FROM dev ORDER BY d DESC, v ASC LIMIT 1
    )
    SELECT n1 AS n_hi, n2 AS n_lo, d_scaled, witness_value,
           CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS ks_d,
           CAST(d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS ks_z
    FROM pick
    """,
    tags=("stats", "inference"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KOLMOGOROV-SMIRNOV two-sample test: is the order-value
    distribution of urgent orders (priority 1-2) the SAME distribution
    as the rest? D = sup_v |F_hi(v) - F_lo(v)| is computed EXACTLY as
    max |cum_hi(v)*n_lo - cum_lo(v)*n_hi| over the distinct-value
    spine — an integer, so the supremum and its witness value are
    engine-exact; the one double division and the asymptotic z =
    D*sqrt(n1*n2/n) happen once on the final row with identical
    expression shape on both engines. Both ECDFs ride ONE two-phase
    running sum (operators/scan.py:global_running_sum) by packing the
    per-value (hi, lo) counts into a single decimal word (KS_PACK) —
    no Exchange SinglePartition anywhere; the argmax is a
    deterministic lexicographic struct-max (max D, then min value).

    Scale shape: map-side-combinable distinct-value count, the
    range-partitioned prefix scan, one broadcast of the 1-row totals
    frame, one scalar reduce. Reference basis: SURVEY.md §2.4 stats
    family (absent in reference)."""
    from ..operators.scan import global_running_sum

    o = table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    pv = (
        o.select(F.col("o_totalprice").alias("v"), hi.alias("hi"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("hi"), 0).otherwise(1)).alias("b"),
        )
    )
    packed = pv.withColumn(
        "pk",
        F.col("a").cast("decimal(38,0)") * F.lit(KS_PACK).cast("decimal(38,0)")
        + F.col("b"),
    )
    rs = global_running_sum(
        packed, ["v"], "pk", out_col="rs", decimal_type="decimal(38,0)"
    )
    unpacked = rs.select(
        "v",
        F.expr(f"rs div CAST({KS_PACK} AS DECIMAL(38,0))").alias("ca"),
        F.expr(
            f"CAST(pmod(rs, CAST({KS_PACK} AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("cb"),
    )
    tot = pv.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    dev = unpacked.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("n2")
            - F.col("cb").cast("decimal(38,0)") * F.col("n1")
        ).alias("d"),
        "v",
    )
    pick = dev.agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv"))).alias("mx"),
    ).select(
        "n1",
        "n2",
        F.col("mx.d").cast("long").alias("d_scaled"),
        (-F.col("mx.nv")).alias("witness_value"),
    )
    ks_d = F.col("d_scaled").cast("double") / (
        F.col("n1").cast("double") * F.col("n2")
    )
    return pick.select(
        F.col("n1").alias("n_hi"),
        F.col("n2").alias("n_lo"),
        "d_scaled",
        "witness_value",
        ks_d.alias("ks_d"),
        (
            ks_d
            * F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            )
        ).alias("ks_z"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test with tie correction — exact integers
# ---------------------------------------------------------------------------
@register(
    "q_mann_whitney",
    oracle="""
    WITH pv AS (
      SELECT l_extendedprice AS v,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 0 ELSE 1 END)
                  AS BIGINT) AS c2
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2, c1 + c2 AS c,
             SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS cb
      FROM pv
    ),
    agg AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c1 AS HUGEINT) * (2 * cb + c + 1)) AS HUGEINT)
               AS r1x2,
             CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS BIGINT) AS tie_term
      FROM cum
    ),
    d AS (
      SELECT n1, n2, n1 + n2 AS n,
             CAST(r1x2 AS BIGINT) AS r1_x2,
             CAST(2 * CAST(n1 AS HUGEINT) * n2 + CAST(n1 AS HUGEINT) * (n1 + 1)
                  - r1x2 AS BIGINT) AS u1_x2,
             tie_term
      FROM agg
    )
    SELECT n1, n2, r1_x2, u1_x2, tie_term,
           CAST(u1_x2 AS DOUBLE)
             / (2.0 * (CAST(n1 AS DOUBLE) * n2)) AS auc_u,
           (CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)
             / (2.0 * sqrt(
                 CAST(CAST(CAST(n1 AS HUGEINT) * n2
                      * (CAST(n AS HUGEINT) * (n + 1) * (n - 1) - tie_term)
                      AS VARCHAR) AS DOUBLE)
                 / (12.0 * (CAST(n AS DOUBLE) * (n - 1))))) AS z_u
    FROM d
    """,
    tags=("stats", "inference"),
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (Wilcoxon rank-sum) test between open ('O') and
    finished ('F') line items on extended price — the nonparametric
    two-group location test, with the textbook TIE CORRECTION. Every
    statistic is exact integer arithmetic to the last step: average
    ranks enter as 2*R1 = sum over distinct values of
    c1*(2*cum_before + c + 1) (twice the rank-sum is always integral,
    even with ties), U follows by identity, and the tie term
    sum(t^3 - t) is a per-value polynomial — all riding ONE two-phase
    running count (no single-partition exchange). The variance
    numerator n1*n2*(n(n+1)(n-1) - T) is exact DECIMAL(38,0) rendered
    to double through strings on the DuckDB side (the >2^53 VARCHAR
    doctrine, COVERAGE.md r10); z and the rank-biserial AUC
    U/(n1*n2) are the only doubles, shaped identically in both
    engines. Emitted BIGINTs are exact through ~10^9 rows per side
    (r1_x2 peaks near n^2); widen to string-rendered decimals beyond.

    Scale shape: map-side-combinable distinct-value count, one
    range-partitioned prefix scan, one scalar reduce — nothing
    data-sized after the first aggregate. Reference basis: SURVEY.md
    §2.4 stats family (absent in reference)."""
    from ..operators.scan import global_running_sum

    li = table(spark, sf_dir, "lineitem")
    pv = (
        li.select(
            F.col("l_extendedprice").alias("v"),
            (F.col("l_linestatus") == "O").alias("g1"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("c2"),
        )
        .withColumn("c", F.col("c1") + F.col("c2"))
    )
    rs = global_running_sum(pv, ["v"], "c", out_col="ci", decimal_type="long")
    cum = rs.withColumn("cb", F.col("ci") - F.col("c"))
    agg = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (2 * F.col("cb") + F.col("c") + 1)
        ).alias("r1x2"),
        # c^3 in 128-bit: a single value with ~2.1e6 duplicates would
        # wrap silently in Spark's long while DuckDB's BIGINT raises —
        # the engines would DIVERGE, not agree-wrong (the r8 lesson's
        # sibling). DECIMAL(38,0)/HUGEINT keeps both exact to ~1e12 ties.
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).cast("long").alias("tie_term"),
    )
    n = F.col("n1") + F.col("n2")
    u1x2 = (
        F.lit(2).cast("decimal(38,0)") * F.col("n1") * F.col("n2")
        + F.col("n1").cast("decimal(38,0)") * (F.col("n1") + 1)
        - F.col("r1x2")
    )
    d = agg.select(
        "n1",
        "n2",
        F.col("r1x2").cast("long").alias("r1_x2"),
        u1x2.cast("long").alias("u1_x2"),
        "tie_term",
        n.alias("n"),
    )
    var_num = (
        F.col("n1").cast("decimal(38,0)")
        * F.col("n2")
        * (
            F.col("n").cast("decimal(38,0)")
            * (F.col("n") + 1)
            * (F.col("n") - 1)
            - F.col("tie_term")
        )
    )
    var_d = var_num.cast("string").cast("double") / (
        F.lit(12.0) * (F.col("n").cast("double") * (F.col("n") - 1))
    )
    return d.select(
        "n1",
        "n2",
        "r1_x2",
        "u1_x2",
        "tie_term",
        (
            F.col("u1_x2").cast("double")
            / (F.lit(2.0) * (F.col("n1").cast("double") * F.col("n2")))
        ).alias("auc_u"),
        (
            (
                F.col("u1_x2").cast("double")
                - F.col("n1").cast("double") * F.col("n2")
            )
            / (F.lit(2.0) * F.sqrt(var_d))
        ).alias("z_u"),
    )


# ---------------------------------------------------------------------------
# Contingency chi-square + Cramer's V (priority x status), ordered-fold sum
# ---------------------------------------------------------------------------
@register(
    "q_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1, 2
    ),
    pr AS (SELECT DISTINCT o_orderpriority AS p FROM orders),
    st AS (SELECT DISTINCT o_orderstatus AS s FROM orders),
    rm AS (SELECT p, CAST(SUM(n_obs) AS BIGINT) AS r FROM obs GROUP BY p),
    cm AS (SELECT s, CAST(SUM(n_obs) AS BIGINT) AS c FROM obs GROUP BY s),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT pr.p, st.s, COALESCE(o.n_obs, 0) AS n_obs, rm.r, cm.c, t.n,
             CAST(t.n AS HUGEINT) * COALESCE(o.n_obs, 0)
               - CAST(rm.r AS HUGEINT) * cm.c AS dev
      FROM pr CROSS JOIN st
      LEFT JOIN obs o ON o.p = pr.p AND o.s = st.s
      JOIN rm ON rm.p = pr.p JOIN cm ON cm.s = st.s CROSS JOIN tot t
    ),
    terms AS (
      SELECT p, s,
             CAST(CAST(dev * dev AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(n AS HUGEINT) * n * r * c AS VARCHAR)
                      AS DOUBLE) AS term
      FROM cells
    ),
    fold AS (
      SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(term ORDER BY p, s)),
               (acc, x) -> acc + x) AS chi2_over_n,
             COUNT(*) AS n_cells
      FROM terms
    )
    SELECT t.n AS n_orders,
           (SELECT COUNT(*) FROM pr) AS n_priority_levels,
           (SELECT COUNT(*) FROM st) AS n_status_levels,
           ((SELECT COUNT(*) FROM pr) - 1)
             * ((SELECT COUNT(*) FROM st) - 1) AS dof,
           f.chi2_over_n,
           sqrt(f.chi2_over_n / (LEAST((SELECT COUNT(*) FROM pr),
                                       (SELECT COUNT(*) FROM st)) - 1))
             AS cramers_v
    FROM fold f CROSS JOIN tot t
    """,
    tags=("stats", "inference"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINGENCY chi-square + CRAMER'S V between order priority and
    order status — the categorical-association screen (is fulfilment
    status independent of priority?). Each spine-complete cell's
    deviation n*n_ij - r_i*c_j is EXACT (HUGEINT / DECIMAL(38,0));
    the classical cell term (O-E)^2/E equals dev^2/(n*r*c), so the
    emitted total is the n-NORMALIZED chi2_over_n = sum of
    dev^2/(n^2*r*c) — exactly the quantity Cramer's V consumes
    (V = sqrt((chi2/n)/(min(r,c)-1))), with no large/small double
    products. Each term goes through the VARCHAR-doctrine double
    render, and the cross-cell sum is an ORDERED (p, s) left fold
    over the sorted cell array — the docs_source_divergence pattern
    — so the double total is bit-identical on any engine and any
    partitioning. Levels are counted from the data. Bound: dev^2
    stays inside DECIMAL(38,0) through ~10^9 orders; widen beyond.

    Scale shape: one map-side-combinable (p, s) count; everything
    after is level-cardinality-sized (15 cells). The spine cross
    join is two broadcast level frames — bounded by construction.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count("*").alias("n_obs"))
    pr = obs.select("p").distinct()
    st = obs.select("s").distinct()
    rm = obs.groupBy("p").agg(F.sum("n_obs").alias("r"))
    cm = obs.groupBy("s").agg(F.sum("n_obs").alias("c"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    cells = (
        pr.crossJoin(F.broadcast(st))
        .join(F.broadcast(obs), ["p", "s"], "left")
        .join(F.broadcast(rm), "p")
        .join(F.broadcast(cm), "s")
        .crossJoin(F.broadcast(tot))
        .select(
            "p",
            "s",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            "r",
            "c",
            "n",
        )
    )
    dev = (
        F.col("n").cast("decimal(38,0)") * F.col("n_obs")
        - F.col("r").cast("decimal(38,0)") * F.col("c")
    )
    den = (
        F.col("n").cast("decimal(38,0)")
        * F.col("n")
        * F.col("r").cast("decimal(38,0)")
        * F.col("c")
    )
    terms = cells.select(
        "p",
        "s",
        (
            (dev * dev).cast("decimal(38,0)").cast("string").cast("double")
            / den.cast("decimal(38,0)").cast("string").cast("double")
        ).alias("term"),
    )
    fold = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("p"), F.col("s"), F.col("term")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2_over_n"),
        F.count("*").alias("n_cells"),
    )
    npr = pr.agg(F.count("*").alias("n_priority_levels"))
    nst = st.agg(F.count("*").alias("n_status_levels"))
    return (
        fold.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(npr))
        .crossJoin(F.broadcast(nst))
        .select(
            F.col("n").alias("n_orders"),
            "n_priority_levels",
            "n_status_levels",
            (
                (F.col("n_priority_levels") - 1)
                * (F.col("n_status_levels") - 1)
            ).alias("dof"),
            F.col("chi2_over_n"),
            F.sqrt(
                F.col("chi2_over_n")
                / (
                    F.least(
                        F.col("n_priority_levels"), F.col("n_status_levels")
                    )
                    - 1
                )
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's t-test (unequal variances) — exact integer moments per group
# ---------------------------------------------------------------------------
@register(
    "q_welch_t_test",
    oracle="""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
      FROM orders
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN hi THEN cents ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN hi THEN 0 ELSE cents END) AS BIGINT) AS s2,
             SUM(CASE WHEN hi THEN CAST(cents AS HUGEINT) * cents
                      ELSE 0 END) AS q1,
             SUM(CASE WHEN hi THEN 0
                      ELSE CAST(cents AS HUGEINT) * cents END) AS q2
      FROM c
    ),
    d AS (
      SELECT n1, n2, s1, s2,
             CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d,
             CAST(CAST(CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1
                       AS VARCHAR) AS DOUBLE) AS a1,
             CAST(CAST(CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2
                       AS VARCHAR) AS DOUBLE) AS a2
      FROM m
    ),
    v AS (
      SELECT n1, n2, s1, s2, n1d, n2d, s1d, s2d,
             a1 / (n1d * (n1d - 1.0)) AS v1,
             a2 / (n2d * (n2d - 1.0)) AS v2
      FROM d
    )
    SELECT n1 AS n_hi, n2 AS n_lo,
           s1d / n1d / 100.0 AS mean_hi,
           s2d / n2d / 100.0 AS mean_lo,
           v1 AS var_hi_cents2, v2 AS var_lo_cents2,
           (s1d / n1d - s2d / n2d) / sqrt(v1 / n1d + v2 / n2d) AS t_welch,
           (v1 / n1d + v2 / n2d) * (v1 / n1d + v2 / n2d)
             / ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
                + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) AS dof_welch
    FROM v
    """,
    tags=("stats", "inference"),
)
def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S t-TEST (unequal variances) between urgent and other
    orders on total price — the parametric counterpart to
    q_mann_whitney on the same split, closing the two-sample kit
    (means: Welch; ranks: Mann-Whitney; whole distribution: KS). Both
    groups' moments come out of ONE scalar pass as exact integers
    (cents, cents^2 in HUGEINT/DECIMAL), the sample-variance
    numerators n*q - s^2 are exact and rendered to double through
    strings (the >2^53 VARCHAR doctrine), and t plus the
    Welch-Satterthwaite dof are the only float expressions — shaped
    identically on both engines. Exact through ~10^9 rows per side
    (q peaks near n*c^2); widen beyond.

    Scale shape: one map-side-combinable scalar aggregate; everything
    after is a 1-row projection. Reference basis: SURVEY.md §2.4
    stats family (absent in reference)."""
    o = table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("long")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    c = o.select(cents.alias("cents"), hi.alias("hi"))
    m = c.agg(
        F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("hi"), 0).otherwise(1)).alias("n2"),
        F.sum(F.when(F.col("hi"), F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("hi"), 0).otherwise(F.col("cents"))).alias("s2"),
        F.sum(
            F.when(
                F.col("hi"),
                F.col("cents").cast("decimal(38,0)") * F.col("cents"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q1"),
        F.sum(
            F.when(
                F.col("hi"), F.lit(0).cast("decimal(38,0)")
            ).otherwise(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            )
        ).alias("q2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    s1d = F.col("s1").cast("string").cast("double")
    s2d = F.col("s2").cast("string").cast("double")
    a1 = (
        (
            F.col("n1").cast("decimal(38,0)") * F.col("q1")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        )
        .cast("string")
        .cast("double")
    )
    a2 = (
        (
            F.col("n2").cast("decimal(38,0)") * F.col("q2")
            - F.col("s2").cast("decimal(38,0)") * F.col("s2")
        )
        .cast("string")
        .cast("double")
    )
    d = m.select(
        "n1", "n2",
        n1d.alias("n1d"), n2d.alias("n2d"),
        s1d.alias("s1d"), s2d.alias("s2d"),
        a1.alias("a1"), a2.alias("a2"),
    )
    v = d.select(
        "n1", "n2", "n1d", "n2d", "s1d", "s2d",
        (F.col("a1") / (F.col("n1d") * (F.col("n1d") - 1.0))).alias("v1"),
        (F.col("a2") / (F.col("n2d") * (F.col("n2d") - 1.0))).alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n1d")
    se2_2 = F.col("v2") / F.col("n2d")
    return v.select(
        F.col("n1").alias("n_hi"),
        F.col("n2").alias("n_lo"),
        (F.col("s1d") / F.col("n1d") / F.lit(100.0)).alias("mean_hi"),
        (F.col("s2d") / F.col("n2d") / F.lit(100.0)).alias("mean_lo"),
        F.col("v1").alias("var_hi_cents2"),
        F.col("v2").alias("var_lo_cents2"),
        (
            (F.col("s1d") / F.col("n1d") - F.col("s2d") / F.col("n2d"))
            / F.sqrt(se2_1 + se2_2)
        ).alias("t_welch"),
        (
            (se2_1 + se2_2) * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (F.col("n1d") - 1.0)
                + se2_2 * se2_2 / (F.col("n2d") - 1.0)
            )
        ).alias("dof_welch"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H (k-group rank ANOVA), exact midranks + tie correction
# ---------------------------------------------------------------------------
_KW_PRIOS = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


def _kw_oracle() -> str:
    cg = ",\n             ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, p in enumerate(_KW_PRIOS, 1)
    )
    ng = ", ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(1, 6)
    )
    rg = ",\n             ".join(
        f"CAST(SUM(CAST(c{i} AS HUGEINT) * (2 * cb + c + 1)) AS HUGEINT)"
        f" AS r{i}x2"
        for i in range(1, 6)
    )
    terms = " + ".join(
        f"(CAST(CAST(CAST(r{i}x2 AS HUGEINT) * r{i}x2 AS VARCHAR) AS DOUBLE)"
        f" / CAST(n{i} AS DOUBLE))"
        for i in range(1, 6)
    )
    return f"""
    WITH pv AS (
      SELECT o_totalprice AS v,
             {cg}
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2, c3, c4, c5,
             c1 + c2 + c3 + c4 + c5 AS c,
             SUM(c1 + c2 + c3 + c4 + c5) OVER (ORDER BY v)
               - (c1 + c2 + c3 + c4 + c5) AS cb
      FROM pv
    ),
    agg AS (
      SELECT {ng},
             {rg},
             CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS BIGINT) AS tie_term
      FROM cum
    ),
    d AS (
      SELECT n1, n2, n3, n4, n5, tie_term,
             n1 + n2 + n3 + n4 + n5 AS n,
             CAST(r1x2 AS BIGINT) AS r1_x2,
             CAST(r2x2 AS BIGINT) AS r2_x2,
             CAST(r3x2 AS BIGINT) AS r3_x2,
             CAST(r4x2 AS BIGINT) AS r4_x2,
             CAST(r5x2 AS BIGINT) AS r5_x2,
             3.0 / (CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE)
                    * (n1 + n2 + n3 + n4 + n5 + 1))
               * ({terms})
             - 3.0 * (n1 + n2 + n3 + n4 + n5 + 1) AS h_raw
      FROM agg
    )
    SELECT n, n1, n2, n3, n4, n5,
           r1_x2, r2_x2, r3_x2, r4_x2, r5_x2, tie_term, h_raw,
           h_raw / (1.0 - CAST(tie_term AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * n - n)) AS h_adj
    FROM d
    """


@register(
    "q_kruskal_wallis",
    oracle=_kw_oracle(),
    tags=("stats", "inference"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H across the five order priorities on order value —
    the k-group generalization of q_mann_whitney (rank ANOVA), with the
    textbook tie correction. The same exact-midrank machinery: per
    distinct value, one pivoted count per group (the priorities are a
    CLOSED enum, so the pivot is five literal columns, no dynamic
    pivot); twice each group's rank sum is the integer
    sum(c_g * (2*cum_before + c + 1)) riding ONE two-phase running
    count. H = 12/(N(N+1)) * sum R_g^2/n_g - 3(N+1) enters doubles only
    at the last step: each r2_g^2 is exact DECIMAL(38,0) rendered
    through VARCHAR (the >2^53 doctrine), the five terms fold in one
    fixed literal order, and the tie denominator 1 - T/(N^3-N) is an
    exact-integer ratio. r2_g^2 stays in 38 digits through ~10^9 rows
    per group.

    Scale shape: map-side-combinable distinct-value pivot, one
    range-partitioned prefix scan, one scalar reduce. Reference basis:
    SURVEY.md §2.4 stats family (absent in reference)."""
    from ..operators.scan import global_running_sum

    o = table(spark, sf_dir, "orders")
    pv = (
        o.select(
            F.col("o_totalprice").alias("v"),
            F.col("o_orderpriority").alias("g"),
        )
        .groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("g") == p, 1).otherwise(0)).alias(
                    f"c{i}"
                )
                for i, p in enumerate(_KW_PRIOS, 1)
            ]
        )
        .withColumn(
            "c",
            F.col("c1") + F.col("c2") + F.col("c3") + F.col("c4")
            + F.col("c5"),
        )
    )
    rs = global_running_sum(pv, ["v"], "c", out_col="ci", decimal_type="long")
    cum = rs.withColumn("cb", F.col("ci") - F.col("c"))
    agg = cum.agg(
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(1, 6)],
        *[
            F.sum(
                F.col(f"c{i}").cast("decimal(38,0)")
                * (2 * F.col("cb") + F.col("c") + 1)
            ).alias(f"r{i}x2")
            for i in range(1, 6)
        ],
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).cast("long").alias("tie_term"),
    )
    n = (
        F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4") + F.col("n5")
    )
    term = None
    for i in range(1, 6):
        t = (
            (F.col(f"r{i}x2") * F.col(f"r{i}x2"))
            .cast("string")
            .cast("double")
            / F.col(f"n{i}").cast("double")
        )
        term = t if term is None else term + t
    h_raw = (
        F.lit(3.0) / (n.cast("double") * (n + 1)) * term
        - F.lit(3.0) * (n + 1)
    )
    d = agg.select(
        n.alias("n"),
        "n1", "n2", "n3", "n4", "n5",
        *[
            F.col(f"r{i}x2").cast("long").alias(f"r{i}_x2")
            for i in range(1, 6)
        ],
        "tie_term",
        h_raw.alias("h_raw"),
    )
    return d.select(
        "n", "n1", "n2", "n3", "n4", "n5",
        "r1_x2", "r2_x2", "r3_x2", "r4_x2", "r5_x2", "tie_term", "h_raw",
        (
            F.col("h_raw")
            / (
                F.lit(1.0)
                - F.col("tie_term").cast("double")
                / (F.col("n").cast("double") * F.col("n") * F.col("n")
                   - F.col("n"))
            )
        ).alias("h_adj"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (exact midranks, Pearson-on-ranks identity)
# ---------------------------------------------------------------------------
@register(
    "q_spearman_rho",
    oracle="""
    WITH xr AS (
      SELECT v, 2 * cb + c + 1 AS rx2 FROM (
        SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c,
               SUM(COUNT(*)) OVER (ORDER BY l_quantity) - COUNT(*) AS cb
        FROM lineitem GROUP BY 1
      )
    ),
    yr AS (
      SELECT v, 2 * cb + c + 1 AS ry2 FROM (
        SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS c,
               SUM(COUNT(*)) OVER (ORDER BY l_extendedprice) - COUNT(*)
                 AS cb
        FROM lineitem GROUP BY 1
      )
    ),
    paired AS (
      SELECT xr.rx2, yr.ry2
      FROM lineitem li
      JOIN xr ON xr.v = li.l_quantity
      JOIN yr ON yr.v = li.l_extendedprice
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT) AS syy,
             CAST(SUM(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT) AS sxy
      FROM paired
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
             AS rho_spearman
    FROM s
    """,
    tags=("stats", "inference"),
)
def q_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between line quantity and extended
    price — the nonparametric monotone-association coefficient, exact
    under ties via the Pearson-on-midranks identity (the d_i^2 shortcut
    formula is WRONG with ties; this is the correct general form).
    Twice each midrank (2*cum_before + c + 1, always integral) comes
    from one distinct-value running count per variable; rows join back
    to their two rank maps (the quantity map is ~50 rows — broadcast;
    the price map is distinct-value-sized — one shuffle join, the
    inherent cost of exact ranks at scale). All five cross sums are
    exact DECIMAL(38,0) (good through ~10^9 rows: n*Sxy peaks near
    4*N^3), rendered through VARCHAR; rho is three pinned double ops +
    one IEEE sqrt.

    Scale shape: two distinct-value aggs, one broadcast + one key join,
    one scalar reduce — no row-count-sized state on the driver.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    from ..operators.scan import global_running_sum

    li = table(spark, sf_dir, "lineitem")

    def rank2(col: str, alias: str) -> DataFrame:
        pv = (
            li.groupBy(F.col(col).alias("v"))
            .agg(F.count("*").alias("c"))
        )
        rs = global_running_sum(
            pv, ["v"], "c", out_col="ci", decimal_type="long"
        )
        return rs.select(
            "v", (2 * (F.col("ci") - F.col("c")) + F.col("c") + 1).alias(alias)
        )

    xr = rank2("l_quantity", "rx2")
    yr = rank2("l_extendedprice", "ry2")
    paired = (
        li.select("l_quantity", "l_extendedprice")
        .join(
            F.broadcast(xr.withColumnRenamed("v", "l_quantity")),
            "l_quantity",
        )
        .join(yr.withColumnRenamed("v", "l_extendedprice"), "l_extendedprice")
    )
    s = paired.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast("decimal(38,0)") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2").cast("decimal(38,0)") * F.col("ry2")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        F.col("n").cast("long").alias("n"),
        (
            num.cast("string").cast("double")
            / F.sqrt(
                denx.cast("string").cast("double")
                * deny.cast("string").cast("double")
            )
        ).alias("rho_spearman"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test (anchored exact power sums -> pinned moments)
# ---------------------------------------------------------------------------
@register(
    "q_jarque_bera",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(l_quantity * 100 AS BIGINT) AS x
      FROM lineitem
    ),
    mu AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT)
               // CAST(COUNT(*) AS HUGEINT) AS m0
      FROM q GROUP BY 1
    ),
    t AS (
      SELECT q.l_returnflag, mu.n,
             CAST(SUM(CAST(x - m0 AS HUGEINT)) AS HUGEINT) AS t1,
             CAST(SUM(CAST(x - m0 AS HUGEINT) * (x - m0)) AS HUGEINT) AS t2,
             CAST(SUM(CAST(x - m0 AS HUGEINT) * (x - m0) * (x - m0))
                  AS HUGEINT) AS t3,
             CAST(SUM(CAST(x - m0 AS HUGEINT) * (x - m0) * (x - m0)
                      * (x - m0)) AS HUGEINT) AS t4
      FROM q JOIN mu ON mu.l_returnflag = q.l_returnflag
      GROUP BY 1, 2
    ),
    m AS (
      SELECT l_returnflag, n,
             CAST(CAST(t1 AS VARCHAR) AS DOUBLE) / n AS a1,
             CAST(CAST(t2 AS VARCHAR) AS DOUBLE) / n AS a2,
             CAST(CAST(t3 AS VARCHAR) AS DOUBLE) / n AS a3,
             CAST(CAST(t4 AS VARCHAR) AS DOUBLE) / n AS a4
      FROM t
    ),
    c AS (
      SELECT l_returnflag, n,
             a2 - a1 * a1 AS m2,
             a3 - 3.0 * a1 * a2 + 2.0 * a1 * a1 * a1 AS m3,
             a4 - 4.0 * a1 * a3 + 6.0 * a1 * a1 * a2
                - 3.0 * a1 * a1 * a1 * a1 AS m4
      FROM m
    )
    SELECT l_returnflag, n,
           m2 / 10000.0 AS var_pop,
           m3 / (m2 * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0 AS kurtosis_ex,
           CAST(n AS DOUBLE) / 6.0
             * (m3 * m3 / (m2 * m2 * m2)
                + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0)
             AS jb_stat
    FROM c
    ORDER BY l_returnflag
    """,
    tags=("stats", "inference"),
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test per return flag on line quantity:
    JB = n/6 * (skew^2 + kurt_ex^2/4), the moment-based goodness-of-fit
    gate every z/t-based method in the kit implicitly assumes. The
    anchored-power-sum trick keeps everything exact: pass 1 takes each
    group's INTEGER floor mean m0 (exact decimal division), pass 2 sums
    d, d^2, d^3, d^4 of the ANCHORED deviations d = 100*qty - m0 —
    |d| is bounded by the value range (not the group sum), so t4 fits
    DECIMAL(38,0) through ~10^13 rows where raw s1^4 would overflow at
    ~10^6. Central moments follow by the standard anchored identities
    in PINNED double shape (t_k exactly VARCHAR-rendered, then a fixed
    polynomial in a1 = t1/n); skewness keeps its sign via one IEEE
    sqrt.

    Scale shape: two map-side-combinable aggregates over the same scan,
    one 3-row broadcast join between them. Reference basis: SURVEY.md
    §2.4 stats family (absent in reference)."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        (F.col("l_quantity") * 100).cast("long").alias("x"),
    )
    # Spark decimal "/" rounds; DuckDB "//" floors. Anchor both engines
    # on the identical integer via the exact sum + integral division
    # (both truncate; the sum is positive, so trunc == floor).
    mu = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s1"),
    ).select(
        "l_returnflag",
        "n",
        F.expr("s1 div cast(n as decimal(38,0))").alias("m0"),
    )
    d = q.join(F.broadcast(mu), "l_returnflag").select(
        "l_returnflag",
        "n",
        (F.col("x") - F.col("m0")).cast("decimal(38,0)").alias("d"),
    )
    t = d.groupBy("l_returnflag", "n").agg(
        F.sum("d").alias("t1"),
        F.sum(F.col("d") * F.col("d")).alias("t2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("t3"),
        F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d")).alias("t4"),
    )
    a1 = F.col("t1").cast("string").cast("double") / F.col("n")
    a2 = F.col("t2").cast("string").cast("double") / F.col("n")
    a3 = F.col("t3").cast("string").cast("double") / F.col("n")
    a4 = F.col("t4").cast("string").cast("double") / F.col("n")
    m = t.select(
        "l_returnflag", "n",
        a1.alias("a1"), a2.alias("a2"), a3.alias("a3"), a4.alias("a4"),
    )
    m2 = F.col("a2") - F.col("a1") * F.col("a1")
    m3 = (
        F.col("a3")
        - F.lit(3.0) * F.col("a1") * F.col("a2")
        + F.lit(2.0) * F.col("a1") * F.col("a1") * F.col("a1")
    )
    m4 = (
        F.col("a4")
        - F.lit(4.0) * F.col("a1") * F.col("a3")
        + F.lit(6.0) * F.col("a1") * F.col("a1") * F.col("a2")
        - F.lit(3.0) * F.col("a1") * F.col("a1") * F.col("a1")
        * F.col("a1")
    )
    c = m.select(
        "l_returnflag", "n",
        m2.alias("m2"), m3.alias("m3"), m4.alias("m4"),
    )
    kurt = F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0)
    return c.select(
        "l_returnflag",
        "n",
        (F.col("m2") / F.lit(10000.0)).alias("var_pop"),
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias(
            "skewness"
        ),
        kurt.alias("kurtosis_ex"),
        (
            F.col("n").cast("double") / F.lit(6.0)
            * (
                F.col("m3") * F.col("m3")
                / (F.col("m2") * F.col("m2") * F.col("m2"))
                + kurt * kurt / F.lit(4.0)
            )
        ).alias("jb_stat"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Cliff's delta ordinal effect size (merged-cumulative pair counting)
# ---------------------------------------------------------------------------
@register(
    "q_cliffs_delta",
    oracle="""
    WITH pv AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2,
             SUM(c2) OVER (ORDER BY v) - c2 AS lo_below,
             SUM(c2) OVER (ORDER BY v DESC) - c2 AS lo_above
      FROM pv
    ),
    agg AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c1 AS HUGEINT) * lo_below) AS HUGEINT) AS gt,
             CAST(SUM(CAST(c1 AS HUGEINT) * lo_above) AS HUGEINT) AS lt,
             CAST(SUM(CAST(c1 AS HUGEINT) * c2) AS HUGEINT) AS eq
      FROM cum
    )
    SELECT n1, n2,
           CAST(gt AS BIGINT) AS gt_pairs,
           CAST(lt AS BIGINT) AS lt_pairs,
           CAST(eq AS BIGINT) AS eq_pairs,
           CAST(CAST(gt - lt AS VARCHAR) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2) AS cliffs_delta
    FROM agg
    """,
    tags=("stats", "inference"),
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIFF'S DELTA between urgent (priority 1-2) and normal orders on
    order value: the ordinal effect size P(X>Y) - P(X<Y) that reviewers
    quote NEXT TO q_mann_whitney's p-value — same split, but delta
    reports magnitude where z_u reports significance, and unlike the
    rank-biserial identity it exposes the three dominance counts
    (gt/lt/eq pairs) as exact witnesses. All n1*n2 pairs are counted
    WITHOUT forming any pair: per distinct value, the lo-group mass
    strictly below and strictly above ride one ascending and one
    descending running count over the distinct-value spine, and
    gt = sum(c1 * lo_below), lt = sum(c1 * lo_above), eq = sum(c1*c2)
    are map-side-combinable integer reduces — exact BIGINTs through
    ~10^9 rows per side.

    Scale shape: distinct-value agg, two range-partitioned prefix
    scans, one scalar reduce; nothing pair-sized ever materializes.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    from ..operators.scan import global_running_sum

    o = table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    pv = (
        o.select(F.col("o_totalprice").alias("v"), hi.alias("g1"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("c2"),
        )
    )
    up = global_running_sum(
        pv, ["v"], "c2", out_col="ci_up", decimal_type="long"
    ).withColumn("lo_below", F.col("ci_up") - F.col("c2"))
    # descending running count: total - ascending inclusive
    tot2 = up.agg(F.sum("c2").alias("n2_all"))
    cum = up.crossJoin(F.broadcast(tot2)).withColumn(
        "lo_above", F.col("n2_all") - F.col("ci_up")
    )
    agg = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("lo_below")).alias(
            "gt"
        ),
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("lo_above")).alias(
            "lt"
        ),
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("c2")).alias("eq"),
    )
    return agg.select(
        "n1",
        "n2",
        F.col("gt").cast("long").alias("gt_pairs"),
        F.col("lt").cast("long").alias("lt_pairs"),
        F.col("eq").cast("long").alias("eq_pairs"),
        (
            (F.col("gt") - F.col("lt")).cast("string").cast("double")
            / (F.col("n1").cast("double") * F.col("n2"))
        ).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired-proportion test (first-half vs second-half urgency)
# ---------------------------------------------------------------------------
@register(
    "q_mcnemar",
    oracle="""
    WITH paired AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderdate < DATE '1995-06-17'
                      AND o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN o_orderdate >= DATE '1995-06-17'
                      AND o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS h2
      FROM orders GROUP BY 1
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM paired
    )
    SELECT a, b, c, d,
           CAST((b - c) * (b - c) AS DOUBLE) / (b + c) AS mcnemar_chi2,
           CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c)
             AS mcnemar_cc
    FROM cells
    """,
    tags=("stats", "inference"),
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S test on paired binary outcomes per customer: "placed
    an urgent-priority order" in the first vs second half of the date
    range (split at the fixed midpoint 1995-06-17). The marginal
    homogeneity question — did urgency adoption CHANGE within the same
    customers — is exactly what an unpaired chi-square (q_cramers_v)
    gets wrong by ignoring the pairing. The 2x2 concordance table
    (a,b,c,d) is two MAX-flags per customer and one scalar reduce;
    the statistic (b-c)^2/(b+c) and its continuity-corrected variant
    are single exact-integer ratios.

    Scale shape: one map-side-combinable per-key agg, one scalar
    reduce. Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mid = F.lit("1995-06-17").cast("date")
    paired = o.groupBy("o_custkey").agg(
        F.max(
            F.when((F.col("o_orderdate") < mid) & urgent, 1).otherwise(0)
        ).alias("h1"),
        F.max(
            F.when((F.col("o_orderdate") >= mid) & urgent, 1).otherwise(0)
        ).alias("h2"),
    )
    cells = paired.agg(
        F.sum(
            F.when((F.col("h1") == 1) & (F.col("h2") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("h1") == 0) & (F.col("h2") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    diff = F.col("b") - F.col("c")
    return cells.select(
        "a", "b", "c", "d",
        ((diff * diff).cast("double") / (F.col("b") + F.col("c"))).alias(
            "mcnemar_chi2"
        ),
        (
            ((F.abs(diff) - 1) * (F.abs(diff) - 1)).cast("double")
            / (F.col("b") + F.col("c"))
        ).alias("mcnemar_cc"),
    )


# ---------------------------------------------------------------------------
# Exact OLS simple regression per group (closed-form, integer moments)
# ---------------------------------------------------------------------------
@register(
    "q_ols_price_on_qty",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_quantity * 100 AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)
               AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM d GROUP BY 1
    ),
    m AS (
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS denx,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS deny,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
             CAST(CAST(n AS VARCHAR) AS DOUBLE) AS nd
      FROM s
    )
    SELECT l_returnflag, n,
           num / denx AS slope,
           (syd - num / denx * sxd) / nd / 100.0 AS intercept_dollars,
           num * num / (denx * deny) AS r2
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("stats", "inference"),
)
def q_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag EXACT ordinary-least-squares fit of extended
    price on quantity — slope, intercept, R^2 in closed form. The
    parametric line q_corr_qty_price's coefficient only hints at, and
    the baseline events_theil_sen's robust slope should be compared
    against. NOT the built-in regr_slope/regr_r2 (their internal double
    accumulation is partitioning-order-dependent, so Spark and DuckDB
    diverge in final ulps): all six moments are exact DECIMAL(38,0)
    integer sums over cent-scaled values, good through ~10^9 rows per
    group (n*Syy peaks near n^2*y^2 ~ 10^37), VARCHAR-rendered; slope
    = (n*Sxy - SxSy)/(n*Sxx - Sx^2), intercept and R^2 = num^2/
    (denx*deny) are pinned double expressions (num^2 would burst 38
    digits as a decimal — squared AFTER the exact render).

    Scale shape: one map-side-combinable scalar pass, 3-row result.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    li = table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        (F.col("l_quantity") * 100).cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    s = d.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    num = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    denx = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("string")
        .cast("double")
    )
    deny = (
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("string")
        .cast("double")
    )
    m = s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        num.alias("num"),
        denx.alias("denx"),
        deny.alias("deny"),
        F.col("sx").cast("string").cast("double").alias("sxd"),
        F.col("sy").cast("string").cast("double").alias("syd"),
        F.col("n").cast("string").cast("double").alias("nd"),
    )
    return m.select(
        "l_returnflag",
        "n",
        (F.col("num") / F.col("denx")).alias("slope"),
        (
            (F.col("syd") - F.col("num") / F.col("denx") * F.col("sxd"))
            / F.col("nd")
            / F.lit(100.0)
        ).alias("intercept_dollars"),
        (
            F.col("num") * F.col("num") / (F.col("denx") * F.col("deny"))
        ).alias("r2"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Cramer-von Mises two-sample (tie-aware midranks, closed-form tie blocks)
# ---------------------------------------------------------------------------
@register(
    "q_cramer_von_mises",
    oracle=f"""
    WITH pv AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2,
             SUM(c1) OVER (ORDER BY v) - c1 AS a1,
             SUM(c2) OVER (ORDER BY v) - c2 AS a2,
             SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS cb
      FROM pv
    ),
    blocks AS (
      -- 12 * sum over the tie block of (midrank - own_pos)^2, exact:
      -- 2d = (2cb + c + 1) - 2a_own; 12*S = 3c(2d)^2 - 6(2d)c(c+1)
      --      + 2c(c+1)(2c+1)
      SELECT
        CAST(SUM(3 * c1 * CAST((2*cb + c1 + c2 + 1 - 2*a1) AS HUGEINT)
                        * (2*cb + c1 + c2 + 1 - 2*a1)
                 - 6 * CAST((2*cb + c1 + c2 + 1 - 2*a1) AS HUGEINT)
                     * c1 * (c1 + 1)
                 + 2 * CAST(c1 AS HUGEINT) * (c1 + 1) * (2*c1 + 1))
             AS HUGEINT) AS s1_12,
        CAST(SUM(3 * c2 * CAST((2*cb + c1 + c2 + 1 - 2*a2) AS HUGEINT)
                        * (2*cb + c1 + c2 + 1 - 2*a2)
                 - 6 * CAST((2*cb + c1 + c2 + 1 - 2*a2) AS HUGEINT)
                     * c2 * (c2 + 1)
                 + 2 * CAST(c2 AS HUGEINT) * (c2 + 1) * (2*c2 + 1))
             AS HUGEINT) AS s2_12,
        CAST(SUM(c1) AS BIGINT) AS n,
        CAST(SUM(c2) AS BIGINT) AS m
      FROM cum
    )
    SELECT n, m,
           CAST(CAST(CAST(n AS HUGEINT) * s1_12 + CAST(m AS HUGEINT)
                     * s2_12 AS VARCHAR) AS DOUBLE) / 12.0 AS u_stat,
           CAST(CAST(CAST(n AS HUGEINT) * s1_12 + CAST(m AS HUGEINT)
                     * s2_12 AS VARCHAR) AS DOUBLE)
             / (12.0 * CAST(n AS DOUBLE) * m * (n + m))
           - (4.0 * CAST(n AS DOUBLE) * m - 1) / (6.0 * (n + m))
             AS t_cvm
    FROM blocks
    """,
    tags=("stats", "inference"),
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER-VON MISES two-sample test on the urgent-vs-rest order
    split — the INTEGRATED-distance companion to q_ks_two_sample's
    supremum: T is sensitive to distribution differences everywhere,
    not just at the single worst point, so it catches spread/shape
    drift KS misses. Anderson's rank form U = n*sum_i (r_i - i)^2 +
    m*sum_j (s_j - j)^2 with TIE-AWARE midranks, each tie block's
    inner sum collapsed CLOSED-FORM (own-sample positions in a block
    are consecutive, so sum (d - t)^2 is a cubic identity — 12*S =
    3c(2d)^2 - 6(2d)c(c+1) + 2c(c+1)(2c+1) stays integral because 2d =
    2*midrank - 2*own_before is). Both samples' a1/a2/cb prefixes ride
    ONE packed two-phase running count (the KS_PACK doctrine); 12*U is
    exact DECIMAL(38,0), VARCHAR-rendered, and T = U/(nm(n+m)) -
    (4mn-1)/(6(m+n)) is pinned double shape.

    Scale shape: distinct-value agg, one range-partitioned prefix
    scan, one scalar reduce. Reference basis: SURVEY.md §2.4 stats
    family (absent in reference)."""
    from ..operators.scan import global_running_sum

    o = table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    pv = (
        o.select(F.col("o_totalprice").alias("v"), hi.alias("g1"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("c2"),
        )
        .withColumn(
            "w",
            F.col("c1").cast("decimal(38,0)") * F.lit(KS_PACK)
            + F.col("c2"),
        )
    )
    rs = global_running_sum(
        pv, ["v"], "w", out_col="cw", decimal_type="decimal(38,0)"
    )
    cum = rs.select(
        "v",
        "c1",
        "c2",
        (
            F.expr(f"cw div {KS_PACK}").cast("long") - F.col("c1")
        ).alias("a1"),
        (
            F.pmod(F.col("cw"), F.lit(KS_PACK)).cast("long") - F.col("c2")
        ).alias("a2"),
    ).withColumn(
        "cb", F.col("a1") + F.col("a2")
    )

    def block12(c, a):
        c = F.col(c).cast("decimal(38,0)")
        td = (
            2 * F.col("cb") + F.col("c1") + F.col("c2") + 1 - 2 * F.col(a)
        ).cast("decimal(38,0)")
        return (
            3 * c * td * td
            - 6 * td * c * (c + 1)
            + 2 * c * (c + 1) * (2 * c + 1)
        )

    blocks = cum.agg(
        F.sum(block12("c1", "a1")).alias("s1_12"),
        F.sum(block12("c2", "a2")).alias("s2_12"),
        F.sum("c1").alias("n"),
        F.sum("c2").alias("m"),
    )
    u12 = (
        F.col("n").cast("decimal(38,0)") * F.col("s1_12")
        + F.col("m").cast("decimal(38,0)") * F.col("s2_12")
    )
    u12d = u12.cast("string").cast("double")
    return blocks.select(
        "n",
        "m",
        (u12d / F.lit(12.0)).alias("u_stat"),
        (
            u12d
            / (
                F.lit(12.0)
                * F.col("n").cast("double")
                * F.col("m")
                * (F.col("n") + F.col("m"))
            )
            - (
                F.lit(4.0) * F.col("n").cast("double") * F.col("m") - 1
            )
            / (F.lit(6.0) * (F.col("n") + F.col("m")))
        ).alias("t_cvm"),
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend test (5-group packed scan)
# ---------------------------------------------------------------------------
JT_PACK = 10**7  # per-group cumulative-count packing base: five fields in
# one DECIMAL(38,0) word covers ~10^7 rows per group (bench scales are
# ~10^6 at sf1); at larger corpora widen to two packed words of base
# 10^12 each riding the same two-phase scan — the KS_PACK doctrine.


def _jt_oracle() -> str:
    pair_terms = []
    for g in range(1, 6):
        for h in range(g + 1, 6):
            pair_terms.append(
                f"2 * CAST(c{h} AS HUGEINT) * m{g} "
                f"+ CAST(c{g} AS HUGEINT) * c{h}"
            )
    t2 = " + ".join(pair_terms)
    ssq = " + ".join(
        f"CAST(n{g} AS HUGEINT) * n{g} * (2 * n{g} + 3)" for g in range(1, 6)
    )
    nsq = " + ".join(f"CAST(n{g} AS HUGEINT) * n{g}" for g in range(1, 6))
    cg = ",\n             ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, p in enumerate(_KW_PRIOS, 1)
    )
    mg = ",\n             ".join(
        f"SUM(c{g}) OVER (ORDER BY v) - c{g} AS m{g}" for g in range(1, 6)
    )
    return f"""
    WITH pv AS (
      SELECT o_totalprice AS v,
             {cg}
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v, c1, c2, c3, c4, c5,
             {mg}
      FROM pv
    ),
    agg AS (
      SELECT CAST(SUM({t2}) AS HUGEINT) AS jt_x2,
             {", ".join(f"CAST(SUM(c{g}) AS BIGINT) AS n{g}"
                        for g in range(1, 6))}
      FROM cum
    ),
    d AS (
      SELECT jt_x2, n1, n2, n3, n4, n5,
             n1 + n2 + n3 + n4 + n5 AS n,
             ({nsq}) AS sum_nsq,
             ({ssq}) AS sum_var
      FROM agg
    )
    SELECT CAST(jt_x2 AS BIGINT)
             + CASE WHEN greatest(n1, n2, n3, n4, n5) >= {JT_PACK}
                    THEN CAST(error('q_jonckheere_terpstra: packing bound'
                                    ' exceeded') AS BIGINT)
                    ELSE 0 END AS jt_x2,
           CAST(n AS BIGINT) AS n,
           (CAST(CAST(CAST(n AS HUGEINT) * n - sum_nsq AS VARCHAR)
                 AS DOUBLE)) / 4.0 AS jt_mean,
           (CAST(CAST(jt_x2 AS VARCHAR) AS DOUBLE) / 2.0
            - CAST(CAST(CAST(n AS HUGEINT) * n - sum_nsq AS VARCHAR)
                   AS DOUBLE) / 4.0)
           / sqrt(CAST(CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sum_var
                            AS VARCHAR) AS DOUBLE) / 72.0) AS z_jt
    FROM d
    """


@register(
    "q_jonckheere_terpstra",
    oracle=_jt_oracle(),
    tags=("stats", "inference"),
)
def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JONCKHEERE-TERPSTRA trend test across the ORDERED priority
    groups (1-URGENT < ... < 5-LOW) on order value — the ordered-
    alternative counterpart of q_kruskal_wallis: KW asks "are the k
    groups different", JT asks "do values RISE with the ordering",
    gaining power exactly when the alternative is monotone. JT =
    sum over ordered group pairs (g < h) of the Mann-Whitney count
    #(x_g < x_h) + #(x_g = x_h)/2; doubled to stay integral, every
    one of the 10 pair counts rides the SAME distinct-value scan:
    2*JT = sum over values of sum_(g<h) [2*c_h*cumbefore_g + c_g*c_h],
    with all five per-group prefixes packed into ONE DECIMAL(38,0)
    running word (base {P}, the KS_PACK doctrine — ~10^7 rows/group;
    widen to two words beyond). The null mean (N^2 - sum n_g^2)/4 and
    the no-tie null variance [N^2(2N+3) - sum n_g^2(2n_g+3)]/72 are
    exact-integer ratios (VARCHAR-rendered); z is the only derived
    double. The tie-corrected variance is a documented refinement —
    with ~15 distinct values per 10^4 rows here the no-tie z is the
    standard textbook form both engines pin identically.

    Scale shape: distinct-value pivot, one packed two-phase prefix
    scan, one scalar reduce — 10 group pairs never materialize.
    Reference basis: SURVEY.md §2.4 stats family (absent in
    reference)."""
    from ..operators.scan import global_running_sum

    o = table(spark, sf_dir, "orders")
    pv = (
        o.select(
            F.col("o_totalprice").alias("v"),
            F.col("o_orderpriority").alias("g"),
        )
        .groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("g") == p, 1).otherwise(0)).alias(
                    f"c{i}"
                )
                for i, p in enumerate(_KW_PRIOS, 1)
            ]
        )
    )
    word = None
    for g in range(1, 6):
        t = F.col(f"c{g}").cast("decimal(38,0)") * F.expr(
            f"cast({JT_PACK ** (g - 1)} as decimal(38,0))"
        )
        word = t if word is None else word + t
    pv = pv.withColumn("w", word)
    rs = global_running_sum(
        pv, ["v"], "w", out_col="cw", decimal_type="decimal(38,0)"
    )
    cum = rs.select(
        "v",
        *[F.col(f"c{g}") for g in range(1, 6)],
        *[
            (
                # mod FIRST, then divide: `div` renders to BIGINT, so
                # dividing the full 5-field word by a low power would
                # overflow long for the high fields
                F.expr(
                    f"(cw % cast({JT_PACK ** g} as decimal(38,0)))"
                    f" div cast({JT_PACK ** (g - 1)} as decimal(38,0))"
                )
                - F.col(f"c{g}")
            ).alias(f"m{g}")
            for g in range(1, 6)
        ],
    )
    t2 = None
    for g in range(1, 6):
        for h in range(g + 1, 6):
            term = 2 * F.col(f"c{h}").cast("decimal(38,0)") * F.col(
                f"m{g}"
            ) + F.col(f"c{g}").cast("decimal(38,0)") * F.col(f"c{h}")
            t2 = term if t2 is None else t2 + term
    agg = cum.agg(
        F.sum(t2).alias("jt_x2"),
        *[F.sum(f"c{g}").alias(f"n{g}") for g in range(1, 6)],
    )
    n = (
        F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4") + F.col("n5")
    )
    sum_nsq = None
    sum_var = None
    for g in range(1, 6):
        nsq = F.col(f"n{g}").cast("decimal(38,0)") * F.col(f"n{g}")
        vt = nsq * (2 * F.col(f"n{g}") + 3)
        sum_nsq = nsq if sum_nsq is None else sum_nsq + nsq
        sum_var = vt if sum_var is None else sum_var + vt
    # loud packing-bound guard (the Kadane doctrine): cum_g <= n_g, so
    # n_g < JT_PACK proves every packed field stayed in its lane; a
    # violation would corrupt the word IDENTICALLY on both engines, so
    # the parity gate could not catch it — fail the job instead.
    guard = F.expr(
        "CASE WHEN greatest(n1, n2, n3, n4, n5) >= "
        f"{JT_PACK} THEN CAST(raise_error('q_jonckheere_terpstra: "
        "packing bound exceeded (per-group rows < 1e7); widen to two "
        "packed words') AS BIGINT) ELSE 0 END"
    )
    d = agg.select(
        (F.col("jt_x2").cast("long") + guard).alias("jt_x2"),
        n.alias("n"),
        (n.cast("decimal(38,0)") * n - sum_nsq)
        .cast("string")
        .cast("double")
        .alias("mean_x4"),
        (
            n.cast("decimal(38,0)") * n * (2 * n + 3) - sum_var
        )
        .cast("string")
        .cast("double")
        .alias("var_x72"),
    )
    return d.select(
        "jt_x2",
        "n",
        (F.col("mean_x4") / F.lit(4.0)).alias("jt_mean"),
        (
            (
                F.col("jt_x2").cast("double") / F.lit(2.0)
                - F.col("mean_x4") / F.lit(4.0)
            )
            / F.sqrt(F.col("var_x72") / F.lit(72.0))
        ).alias("z_jt"),
    )


q_jonckheere_terpstra.__doc__ = q_jonckheere_terpstra.__doc__.format(
    P=JT_PACK
)


# ---------------------------------------------------------------------------
# Extreme studentized deviate per group (Grubbs statistic + exact witness)
# ---------------------------------------------------------------------------
@register(
    "q_extreme_studentized",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(l_orderkey AS BIGINT) AS k,
             CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)
               AS x
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
      FROM d GROUP BY 1
    ),
    dev AS (
      SELECT d.l_returnflag, d.k, d.x,
             abs(s.n * CAST(d.x AS HUGEINT) - s.s1) AS ad,
             s.n, s.s1, s.s2
      FROM d JOIN s ON s.l_returnflag = d.l_returnflag
    ),
    pick AS (
      SELECT l_returnflag, k, x, ad, n, s1, s2,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY ad DESC, k ASC) AS rn
      FROM dev
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           k AS witness_orderkey,
           CAST(x AS DOUBLE) / 100.0 AS witness_price,
           CAST(CAST(ad AS VARCHAR) AS DOUBLE)
             / (CAST(n AS DOUBLE)
                * sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
                       / (CAST(n AS DOUBLE) * n))) AS g_stat
    FROM pick WHERE rn = 1
    ORDER BY l_returnflag
    """,
    tags=("stats", "inference"),
)
def q_extreme_studentized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS' extreme studentized deviate per return flag: the single
    most-outlying extended price, G = max|x - mean| / sd_pop, with a
    DETERMINISTIC witness row — the screening statistic behind every
    "is this point an outlier" review, complementing the MAD-based
    robust gates (events_mad_outliers) with the classical normal-
    theory form. The argmax needs NO doubles: |x - mean| maximizes
    exactly as the integer |n*x - s1| (ties break on the smaller order
    key), so the witness is engine-pinned; G itself is the only
    derived double — |n*x-s1| / (n * sd) with sd from the exact
    integer variance numerator (VARCHAR-rendered past 2^53).

    Scale shape: one scalar-moment pass, one broadcast join back, one
    per-group TakeOrdered(1). Reference basis: SURVEY.md §2.4 stats
    family (absent in reference)."""
    li = table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        F.col("l_orderkey").cast("long").alias("k"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    s = d.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("s2"),
    )
    dev = d.join(F.broadcast(s), "l_returnflag").select(
        "l_returnflag",
        "k",
        "x",
        F.abs(
            F.col("n") * F.col("x").cast("decimal(38,0)") - F.col("s1")
        ).alias("ad"),
        "n",
        "s1",
        "s2",
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("ad"), F.asc("k")
    )
    pick = dev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    var_num = (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return pick.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("k").alias("witness_orderkey"),
        (F.col("x").cast("double") / F.lit(100.0)).alias("witness_price"),
        (
            F.col("ad").cast("string").cast("double")
            / (
                F.col("n").cast("string").cast("double")
                * F.sqrt(
                    var_num.cast("string").cast("double")
                    / (
                        F.col("n").cast("string").cast("double")
                        * F.col("n").cast("string").cast("double")
                    )
                )
            )
        ).alias("g_stat"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# One-way ANOVA F across the priority groups (exact moments, fixed fold)
# ---------------------------------------------------------------------------
def _anova_oracle() -> str:
    cg = ",\n             ".join(
        f"""CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n{i},
             CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN x ELSE 0 END)
                  AS HUGEINT) AS s1_{i},
             CAST(SUM(CASE WHEN o_orderpriority = '{p}'
                           THEN CAST(x AS HUGEINT) * x ELSE 0 END)
                  AS HUGEINT) AS s2_{i}"""
        for i, p in enumerate(_KW_PRIOS, 1)
    )
    ssb_terms = " + ".join(
        f"(CAST(CAST(s1_{i} * s1_{i} AS VARCHAR) AS DOUBLE)"
        f" / CAST(n{i} AS DOUBLE))"
        for i in range(1, 6)
    )
    s1_all = " + ".join(f"s1_{i}" for i in range(1, 6))
    s2_all = " + ".join(f"s2_{i}" for i in range(1, 6))
    n_all = " + ".join(f"n{i}" for i in range(1, 6))
    return f"""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS x
      FROM orders
    ),
    s AS (
      SELECT {cg}
      FROM d
    ),
    m AS (
      SELECT n1, n2, n3, n4, n5,
             CAST({n_all} AS BIGINT) AS n,
             ({ssb_terms}) AS gsum,
             CAST(CAST(({s1_all}) * ({s1_all}) AS VARCHAR) AS DOUBLE)
               AS s1sq,
             CAST(CAST({s2_all} AS VARCHAR) AS DOUBLE) AS s2d
      FROM s
    )
    SELECT n, n1, n2, n3, n4, n5,
           (gsum - s1sq / n) / 10000.0 AS ss_between,
           (s2d - gsum) / 10000.0 AS ss_within,
           ((gsum - s1sq / n) / 4.0) / ((s2d - gsum) / (n - 5))
             AS f_stat
    FROM m
    """


@register(
    "q_anova_oneway",
    oracle=_anova_oracle(),
    tags=("stats", "inference"),
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ONE-WAY ANOVA F across the five order priorities on
    order value — the parametric counterpart of q_kruskal_wallis and
    the k-group extension of q_welch_t_test's 2-group t. All moments
    exact: per-group n, sum, sum-of-squares in DECIMAL(38,0) cents
    from ONE pivoted scalar pass (closed 5-literal enum); the between-
    group sum folds s1_g^2/n_g in fixed literal order with each square
    VARCHAR-rendered, SS_between = sum - S1^2/N and SS_within =
    sum(s2) - sum follow by the standard identities in pinned double
    shape, and F = (SSB/(k-1))/(SSW/(N-k)) is the only derived ratio.

    Scale shape: one map-side-combinable scalar pass, one 1-row
    projection. Reference basis: SURVEY.md §2.4 stats family (absent
    in reference)."""
    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    aggs = []
    for i, p in enumerate(_KW_PRIOS, 1):
        hit = F.col("o_orderpriority") == p
        aggs += [
            F.sum(F.when(hit, 1).otherwise(0)).alias(f"n{i}"),
            F.sum(
                F.when(hit, F.col("x")).otherwise(0).cast("decimal(38,0)")
            ).alias(f"s1_{i}"),
            F.sum(
                F.when(hit, F.col("x").cast("decimal(38,0)") * F.col("x"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"s2_{i}"),
        ]
    s = d.agg(*aggs)
    gsum = None
    s1_all = None
    s2_all = None
    n_all = None
    for i in range(1, 6):
        t = (
            (F.col(f"s1_{i}") * F.col(f"s1_{i}"))
            .cast("string")
            .cast("double")
            / F.col(f"n{i}").cast("double")
        )
        gsum = t if gsum is None else gsum + t
        s1_all = (
            F.col(f"s1_{i}")
            if s1_all is None
            else s1_all + F.col(f"s1_{i}")
        )
        s2_all = (
            F.col(f"s2_{i}")
            if s2_all is None
            else s2_all + F.col(f"s2_{i}")
        )
        n_all = F.col(f"n{i}") if n_all is None else n_all + F.col(f"n{i}")
    m = s.select(
        *[F.col(f"n{i}") for i in range(1, 6)],
        n_all.alias("n"),
        gsum.alias("gsum"),
        (s1_all * s1_all).cast("string").cast("double").alias("s1sq"),
        s2_all.cast("string").cast("double").alias("s2d"),
    )
    ssb = F.col("gsum") - F.col("s1sq") / F.col("n")
    ssw = F.col("s2d") - F.col("gsum")
    return m.select(
        "n", "n1", "n2", "n3", "n4", "n5",
        (ssb / F.lit(10000.0)).alias("ss_between"),
        (ssw / F.lit(10000.0)).alias("ss_within"),
        ((ssb / F.lit(4.0)) / (ssw / (F.col("n") - 5))).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe / Levene variance-equality test (median-centered)
# ---------------------------------------------------------------------------
def _levene_oracle() -> str:
    cg = ",\n             ".join(
        f"""CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n{i},
             CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN z2 ELSE 0 END)
                  AS HUGEINT) AS t1_{i},
             CAST(SUM(CASE WHEN o_orderpriority = '{p}'
                           THEN CAST(z2 AS HUGEINT) * z2 ELSE 0 END)
                  AS HUGEINT) AS t2_{i}"""
        for i, p in enumerate(_KW_PRIOS, 1)
    )
    gsum_terms = " + ".join(
        f"(CAST(CAST(t1_{i} * t1_{i} AS VARCHAR) AS DOUBLE)"
        f" / CAST(n{i} AS DOUBLE))"
        for i in range(1, 6)
    )
    t1_all = " + ".join(f"t1_{i}" for i in range(1, 6))
    t2_all = " + ".join(f"t2_{i}" for i in range(1, 6))
    n_all = " + ".join(f"n{i}" for i in range(1, 6))
    return f"""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS x
      FROM orders
    ),
    med AS (
      SELECT o_orderpriority,
             CAST(round(2 * quantile_cont(x, 0.5)) AS BIGINT) AS med2
      FROM d GROUP BY 1
    ),
    z AS (
      SELECT d.o_orderpriority,
             abs(2 * d.x - m.med2) AS z2
      FROM d JOIN med m ON m.o_orderpriority = d.o_orderpriority
    ),
    s AS (
      SELECT {cg}
      FROM z
    ),
    m2 AS (
      SELECT n1, n2, n3, n4, n5,
             CAST({n_all} AS BIGINT) AS n,
             ({gsum_terms}) AS gsum,
             CAST(CAST(({t1_all}) * ({t1_all}) AS VARCHAR) AS DOUBLE)
               AS t1sq,
             CAST(CAST({t2_all} AS VARCHAR) AS DOUBLE) AS t2d
      FROM s
    )
    SELECT n, n1, n2, n3, n4, n5,
           ((gsum - t1sq / n) / 4.0) / ((t2d - gsum) / (n - 5))
             AS w_stat
    FROM m2
    """


@register(
    "q_levene_test",
    oracle=_levene_oracle(),
    tags=("stats", "inference"),
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE (median-centered Levene) variance-equality test
    across the five priorities — the gate q_anova_oneway itself
    assumes (equal variances) and the robust choice over the classical
    mean-centered Levene (a heavy tail inflates the mean spread but
    not the median spread). Exactness rides the half-integer trick:
    each group's exact median of integer cents is a half-integer, so
    z2 = |2x - 2*median| is a PURE INTEGER (both engines round the
    interpolated median identically — 2*quantile is integral), and the
    test is then literally q_anova_oneway's machinery applied to z2:
    pivoted exact moments, fixed-order VARCHAR-rendered fold, one
    F-shaped ratio W.

    Scale shape: one per-group exact median (5 groups — sort-bounded),
    one broadcast join back, one pivoted scalar pass. Reference basis:
    SURVEY.md §2.4 stats family (absent in reference)."""
    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    med = d.groupBy("o_orderpriority").agg(
        F.round(2 * F.expr("percentile(x, 0.5D)")).cast("long").alias(
            "med2"
        )
    )
    z = d.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        F.abs(2 * F.col("x") - F.col("med2")).alias("z2"),
    )
    aggs = []
    for i, p in enumerate(_KW_PRIOS, 1):
        hit = F.col("o_orderpriority") == p
        aggs += [
            F.sum(F.when(hit, 1).otherwise(0)).alias(f"n{i}"),
            F.sum(
                F.when(hit, F.col("z2")).otherwise(0).cast("decimal(38,0)")
            ).alias(f"t1_{i}"),
            F.sum(
                F.when(hit, F.col("z2").cast("decimal(38,0)") * F.col("z2"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"t2_{i}"),
        ]
    s = z.agg(*aggs)
    gsum = None
    t1_all = None
    t2_all = None
    n_all = None
    for i in range(1, 6):
        t = (
            (F.col(f"t1_{i}") * F.col(f"t1_{i}"))
            .cast("string")
            .cast("double")
            / F.col(f"n{i}").cast("double")
        )
        gsum = t if gsum is None else gsum + t
        t1_all = (
            F.col(f"t1_{i}")
            if t1_all is None
            else t1_all + F.col(f"t1_{i}")
        )
        t2_all = (
            F.col(f"t2_{i}")
            if t2_all is None
            else t2_all + F.col(f"t2_{i}")
        )
        n_all = F.col(f"n{i}") if n_all is None else n_all + F.col(f"n{i}")
    m2 = s.select(
        *[F.col(f"n{i}") for i in range(1, 6)],
        n_all.alias("n"),
        gsum.alias("gsum"),
        (t1_all * t1_all).cast("string").cast("double").alias("t1sq"),
        t2_all.cast("string").cast("double").alias("t2d"),
    )
    return m2.select(
        "n", "n1", "n2", "n3", "n4", "n5",
        (
            (
                (F.col("gsum") - F.col("t1sq") / F.col("n"))
                / F.lit(4.0)
            )
            / ((F.col("t2d") - F.col("gsum")) / (F.col("n") - 5))
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Deterministic permutation (random-relabeling) test for the mean difference
# ---------------------------------------------------------------------------
PERM_K = 32  # deterministic hash relabelings; z stabilizes ~1/sqrt(K)


def _perm_oracle() -> str:
    h = (
        "CAST(('0x' || substring(md5(CAST({k} AS VARCHAR) || '|' ||"
        " CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0"
    )
    per_k = []
    for k in range(1, PERM_K + 1):
        hk = h.format(k=k)
        per_k.append(
            f"""CAST(SUM(CASE WHEN {hk} THEN x ELSE 0 END) AS HUGEINT)
                 AS s0_{k},
             CAST(SUM(CASE WHEN {hk} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n0_{k}"""
        )
    dks = []
    for k in range(1, PERM_K + 1):
        dks.append(
            f"(CAST(CAST(s0_{k} AS VARCHAR) AS DOUBLE) / n0_{k}"
            f" - CAST(CAST(st - s0_{k} AS VARCHAR) AS DOUBLE)"
            f" / (nt - n0_{k}))"
        )
    mean_fold = " + ".join(f"({d})" for d in dks)
    var_fold = " + ".join(f"({d}) * ({d})" for d in dks)
    return f"""
    WITH d AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS x,
             o_orderpriority IN ('1-URGENT','2-HIGH') AS hi
      FROM orders
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN hi THEN x ELSE 0 END) AS HUGEINT) AS s_hi,
             CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS st,
             CAST(COUNT(*) AS BIGINT) AS nt,
             {", ".join(per_k)}
      FROM d
    ),
    m AS (
      SELECT n_hi, nt - n_hi AS n_lo,
             CAST(CAST(s_hi AS VARCHAR) AS DOUBLE) / n_hi
               - CAST(CAST(st - s_hi AS VARCHAR) AS DOUBLE)
                 / (nt - n_hi) AS d_obs,
             ({mean_fold}) / {PERM_K}.0 AS null_mean,
             ({var_fold}) / {PERM_K}.0 AS null_m2
      FROM s
    )
    SELECT n_hi, n_lo,
           d_obs / 100.0 AS d_obs_dollars,
           null_mean / 100.0 AS null_mean_dollars,
           sqrt(null_m2 - null_mean * null_mean) / 100.0
             AS null_sd_dollars,
           (d_obs - null_mean)
             / sqrt(null_m2 - null_mean * null_mean) AS z_perm
    FROM m
    """


@register(
    "q_permutation_test",
    oracle=_perm_oracle(),
    tags=("stats", "inference"),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC permutation test for the urgent-vs-rest mean order
    value difference: {K} hash-driven label relabelings (the Monte
    Carlo random-relabeling null — group sizes float binomially, the
    bootstrap_ci doctrine's honest caveat) computed in ONE scalar
    pass — every relabeling is just a pair of conditional exact sums
    under md5(seed|key)%2, so the whole null distribution costs one
    scan, no shuffle, no RNG state (rerunnable bit-identically
    anywhere, the events_bootstrap_ci trick applied to label
    exchange). d_obs, the {K} null diffs, their mean/sd (fixed-order
    folds of VARCHAR-exact terms), and the permutation z emit from
    exact integers; complements q_welch_t_test's parametric z with a
    distribution-free one.

    Scale shape: one map-side-combinable scalar pass ({K}x2 + 4
    conditional aggregates), 1-row output. Reference basis: SURVEY.md
    §2.4 stats family (absent in reference)."""
    from ..functions.text import portable_hash32

    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("x"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hi"),
    )
    aggs = [
        F.sum(F.when(F.col("hi"), F.col("x")).otherwise(0).cast(
            "decimal(38,0)"
        )).alias("s_hi"),
        F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("n_hi"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("st"),
        F.count("*").alias("nt"),
    ]
    for k in range(1, PERM_K + 1):
        hk = (
            portable_hash32(
                F.concat(F.lit(f"{k}|"), F.col("o_orderkey").cast("string"))
            )
            % 2
            == 0
        )
        aggs += [
            F.sum(
                F.when(hk, F.col("x")).otherwise(0).cast("decimal(38,0)")
            ).alias(f"s0_{k}"),
            F.sum(F.when(hk, 1).otherwise(0)).alias(f"n0_{k}"),
        ]
    s = d.agg(*aggs)
    dks = []
    for k in range(1, PERM_K + 1):
        dks.append(
            F.col(f"s0_{k}").cast("string").cast("double")
            / F.col(f"n0_{k}")
            - (F.col("st") - F.col(f"s0_{k}")).cast("string").cast(
                "double"
            )
            / (F.col("nt") - F.col(f"n0_{k}"))
        )
    mean_fold = None
    var_fold = None
    for dk in dks:
        mean_fold = dk if mean_fold is None else mean_fold + dk
        var_fold = dk * dk if var_fold is None else var_fold + dk * dk
    d_obs = (
        F.col("s_hi").cast("string").cast("double") / F.col("n_hi")
        - (F.col("st") - F.col("s_hi")).cast("string").cast("double")
        / (F.col("nt") - F.col("n_hi"))
    )
    m = s.select(
        F.col("n_hi"),
        (F.col("nt") - F.col("n_hi")).alias("n_lo"),
        d_obs.alias("d_obs"),
        (mean_fold / F.lit(float(PERM_K))).alias("null_mean"),
        (var_fold / F.lit(float(PERM_K))).alias("null_m2"),
    )
    sd = F.sqrt(
        F.col("null_m2") - F.col("null_mean") * F.col("null_mean")
    )
    return m.select(
        "n_hi",
        "n_lo",
        (F.col("d_obs") / F.lit(100.0)).alias("d_obs_dollars"),
        (F.col("null_mean") / F.lit(100.0)).alias("null_mean_dollars"),
        (sd / F.lit(100.0)).alias("null_sd_dollars"),
        ((F.col("d_obs") - F.col("null_mean")) / sd).alias("z_perm"),
    )


q_permutation_test.__doc__ = q_permutation_test.__doc__.format(K=PERM_K)

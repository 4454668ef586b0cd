"""Graph analytics queries (Pregel-as-join iterations over DataFrames).

Connected components live in operators/components.py (dedup_clusters);
this module adds centrality. The reference has no graph capability at
all; the target is the iterative-join pattern that scales as one hash
shuffle per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    hits_fixed_point,
    pagerank_fixed_point,
    ppr_fixed_point,
)
from .registry import register, table

PR_ITER = 3
PR_TOPK = 20


def _pr_oracle() -> str:
    head = f"""
    WITH e0 AS (SELECT DISTINCT 2 * l_suppkey AS src,
                                2 * l_partkey + 1 AS dst FROM lineitem),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    it0 AS (SELECT node, deg, {SCALE} // n AS r FROM deg CROSS JOIN nn)"""
    its = []
    for i in range(1, PR_ITER + 1):
        its.append(f""",
    it{i} AS (
      SELECT d.node, d.deg,
             ({DAMP_DEN - DAMP_NUM} * {SCALE} // {DAMP_DEN}) // nn.n
               + ({DAMP_NUM} * COALESCE(s.c, 0)) // {DAMP_DEN} AS r
      FROM deg d CROSS JOIN nn
      LEFT JOIN (SELECT e.dst AS node, SUM(r.r // r.deg) AS c
                 FROM edges e JOIN it{i - 1} r ON e.src = r.node
                 GROUP BY e.dst) s ON s.node = d.node
    )"""
        )
    return (
        head
        + "".join(its)
        + f"""
    SELECT CASE WHEN t.node % 2 = 0 THEN 's' || (t.node // 2)
                ELSE 'p' || (t.node // 2) END AS node,
           CAST(t.r AS BIGINT) AS rank
    FROM (SELECT node, r FROM it{PR_ITER}
          ORDER BY r DESC, node LIMIT {PR_TOPK}) t"""
    )


@register("graph_pagerank_lineitem", oracle=_pr_oracle(), tags=("graph", "iterative"))
def graph_pagerank_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} PageRank nodes of the (symmetrized) supplier<->part
    purchase graph from lineitem — {I} Pregel-as-join supersteps, one
    hash shuffle each (operators/pagerank.py). Fixed-point integer
    arithmetic makes the iteration order-independent, so the DuckDB
    oracle's unrolled replay hash-matches bit-for-bit — an EXACT
    correctness gate for an iterative graph algorithm. Ties in the top-k
    break on the node id.

    Nodes are encoded as INTEGERS (supplier s -> 2s, part p -> 2p+1)
    through the whole iteration — integer keys hash/shuffle several
    times faster than 's123'-style strings (measured 5.4s -> 3.6s cold
    at sf0.1) — and the human-readable 's…'/'p…' label is projected
    only on the final top-{K} rows."""
    li = table(spark, sf_dir, "lineitem")
    # symmetrize BEFORE dedup so the whole edge build is ONE shuffle:
    # after repartition("src"), hash(src) satisfies the (src, dst)
    # clustering requirement (subset partitioning), so dropDuplicates
    # dedups partition-locally with no second exchange — vs the former
    # distinct-then-symmetrize-then-repartition double shuffle
    fwd = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    rev = li.select(
        (F.col("l_partkey") * 2 + 1).alias("src"),
        (F.col("l_suppkey") * 2).alias("dst"),
    )
    edges = (
        fwd.unionAll(rev).repartition("src").dropDuplicates(["src", "dst"])
    )
    ranks = pagerank_fixed_point(edges, PR_ITER, pre_partitioned=True)
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(PR_TOPK)
        .select(
            F.expr(
                "case when node % 2 = 0 then 's' || (node div 2)"
                " else 'p' || (node div 2) end"
            ).alias("node"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the directed supplier -> part purchase graph
# ---------------------------------------------------------------------------
HITS_ITER = 3
HITS_TOPK = 20


def _hits_oracle() -> str:
    from ..operators.pagerank import HITS_SCALE

    head = """
    WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
    h0 AS (SELECT src AS node, CAST({s} AS BIGINT) AS h
           FROM (SELECT DISTINCT src FROM e))""".format(s=HITS_SCALE)
    its = []
    for i in range(1, HITS_ITER + 1):
        its.append(f""",
    ra{i} AS (SELECT e.dst AS node, SUM(h.h) AS ra
              FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst),
    ma{i} AS (SELECT MAX(ra) AS m FROM ra{i}),
    a{i} AS (SELECT node, (ra * {HITS_SCALE}) // m AS a
             FROM ra{i} CROSS JOIN ma{i}),
    rh{i} AS (SELECT e.src AS node, SUM(a.a) AS rh
              FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
    mh{i} AS (SELECT MAX(rh) AS m FROM rh{i}),
    h{i} AS (SELECT node, (rh * {HITS_SCALE}) // m AS h
             FROM rh{i} CROSS JOIN mh{i})"""
        )
    last = HITS_ITER
    return (
        head
        + "".join(its)
        + f""",
    top_h AS (SELECT node, h AS score FROM h{last}
              ORDER BY h DESC, node LIMIT {HITS_TOPK}),
    top_a AS (SELECT node, a AS score FROM a{last}
              ORDER BY a DESC, node LIMIT {HITS_TOPK}),
    lab AS (
      SELECT 'hub' AS kind, 's' || CAST(node AS VARCHAR) AS lbl, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, node) AS rnk
      FROM top_h
      UNION ALL
      SELECT 'auth' AS kind, 'p' || CAST(node AS VARCHAR) AS lbl, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, node) AS rnk
      FROM top_a
    )
    SELECT kind, lbl AS node, CAST(score AS BIGINT) AS score,
           CAST(rnk AS BIGINT) AS rnk
    FROM lab"""
    )


@register("graph_hits_lineitem", oracle=_hits_oracle(), tags=("graph", "iterative"))
def graph_hits_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} hubs (suppliers) and authorities (parts) of the DIRECTED
    supplier->part purchase graph by HITS mutual reinforcement — the
    bipartite companion to graph_pagerank_lineitem's symmetrized walk.
    Three rounds of a(p) = sum h(in-edges), h(s) = sum a(out-edges),
    each side max-normalized to fixed-point SCALE with truncating
    integer division (operators/pagerank.hits_fixed_point) — all-integer
    arithmetic, so the DuckDB oracle's unrolled replay hash-matches
    exactly. Per-kind rank ties break on the node id; the rnk column is
    computed AFTER the top-k cut (20-row frames), so no unbounded
    single-partition window appears in the plan — top-k itself is
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    edges = (
        li.select(F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst"))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )
    hubs, auths = hits_fixed_point(edges, HITS_ITER, pre_partitioned=True)
    top_h = hubs.orderBy(F.col("h").desc(), "node").limit(HITS_TOPK).select(
        F.lit("hub").alias("kind"),
        F.expr("'s' || cast(node as string)").alias("node"),
        F.col("h").alias("score"),
        F.col("node").alias("__id"),
    )
    top_a = auths.orderBy(F.col("a").desc(), "node").limit(HITS_TOPK).select(
        F.lit("auth").alias("kind"),
        F.expr("'p' || cast(node as string)").alias("node"),
        F.col("a").alias("score"),
        F.col("node").alias("__id"),
    )
    w = Window.partitionBy("kind").orderBy(F.col("score").desc(), F.col("__id"))
    return (
        top_h.unionAll(top_a)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("kind", "node", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart) from seed suppliers
# ---------------------------------------------------------------------------
PPR_ITER = 3
PPR_TOPK = 20
PPR_SEED_MOD = 100  # seeds = suppliers with suppkey % 100 == 0


def _ppr_oracle() -> str:
    head = f"""
    WITH e0 AS (SELECT DISTINCT 2 * l_suppkey AS src,
                                2 * l_partkey + 1 AS dst FROM lineitem),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    seeds AS (SELECT DISTINCT 2 * l_suppkey AS node FROM lineitem
              WHERE l_suppkey % {PPR_SEED_MOD} = 0),
    ns AS (SELECT COUNT(*) AS ns FROM seeds),
    base AS (
      SELECT d.node, d.deg, ns.ns,
             CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
      FROM deg d LEFT JOIN seeds s ON s.node = d.node CROSS JOIN ns
    ),
    it0 AS (SELECT node, deg, ns, is_seed,
                   CASE WHEN is_seed = 1 THEN {SCALE} // ns ELSE 0 END AS r
            FROM base)"""
    its = []
    for i in range(1, PPR_ITER + 1):
        its.append(f""",
    it{i} AS (
      SELECT b.node, b.deg, b.ns, b.is_seed,
             CASE WHEN b.is_seed = 1
                  THEN ({DAMP_DEN - DAMP_NUM} * {SCALE} // {DAMP_DEN}) // b.ns
                  ELSE 0 END
               + ({DAMP_NUM} * COALESCE(s.c, 0)) // {DAMP_DEN} AS r
      FROM base b
      LEFT JOIN (SELECT e.dst AS node, SUM(r.r // r.deg) AS c
                 FROM edges e JOIN it{i - 1} r ON e.src = r.node
                 GROUP BY e.dst) s ON s.node = b.node
    )"""
        )
    return (
        head
        + "".join(its)
        + f"""
    SELECT CASE WHEN t.node % 2 = 0 THEN 's' || (t.node // 2)
                ELSE 'p' || (t.node // 2) END AS node,
           CAST(t.r AS BIGINT) AS rank
    FROM (SELECT node, r FROM it{PPR_ITER}
          ORDER BY r DESC, node LIMIT {PPR_TOPK}) t"""
    )


@register("graph_ppr_seeds", oracle=_ppr_oracle(), tags=("graph", "iterative"))
def graph_ppr_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seed suppliers (suppkey % 100 == 0) on
    the symmetrized supplier<->part graph — random walk with restart,
    the "expand relevance from known-good nodes" primitive used for
    seeded data selection. Identical fixed-point shape to
    graph_pagerank_lineitem, except all teleport mass returns to the
    seed set; the oracle replays all {PPR_ITER} iterations bit-exactly.
    Top-{PPR_TOPK} by rank: seeds dominate, their purchase-graph
    neighborhoods fill the tail — which is the point."""
    li = table(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    rev = li.select(
        (F.col("l_partkey") * 2 + 1).alias("src"),
        (F.col("l_suppkey") * 2).alias("dst"),
    )
    edges = (
        fwd.unionAll(rev).repartition("src").dropDuplicates(["src", "dst"])
    )
    seeds = (
        li.filter(F.col("l_suppkey") % PPR_SEED_MOD == 0)
        .select((F.col("l_suppkey") * 2).alias("node"))
        .distinct()
    )
    ranks = ppr_fixed_point(edges, seeds, PPR_ITER, pre_partitioned=True)
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(PPR_TOPK)
        .select(
            F.expr(
                "case when node % 2 = 0 then 's' || (node div 2)"
                " else 'p' || (node div 2) end"
            ).alias("node"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round peel) on the customer<->supplier graph
# ---------------------------------------------------------------------------
KCORE_K = 10
KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    head = f"""
    WITH e0 AS (SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    a0 AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""
    its = []
    for r in range(1, KCORE_ROUNDS + 1):
        its.append(f""",
    d{r} AS (SELECT src, COUNT(*) AS c FROM a{r - 1} GROUP BY src),
    k{r} AS (SELECT src AS node FROM d{r} WHERE c >= {KCORE_K}),
    a{r} AS (SELECT e.src, e.dst FROM a{r - 1} e
             JOIN k{r} s ON e.src = s.node
             JOIN k{r} t ON e.dst = t.node)"""
        )
    return (
        head
        + "".join(its)
        + f"""
    SELECT CASE WHEN src % 2 = 0 THEN 'c' || (src // 2)
                ELSE 's' || (src // 2) END AS node,
           CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM a{KCORE_ROUNDS} GROUP BY src"""
    )


@register("graph_k_core", oracle=_kcore_oracle(), tags=("graph", "iterative"))
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-core decomposition of the (symmetrized) customer<->supplier
    purchase graph: peel nodes of degree < {K}, remove their edges,
    repeat — the classic density filter that isolates the strongly
    interconnected trading core (and, on document pair graphs, the
    "template cluster" detector). {R} peel rounds are UNROLLED with a
    fixed round count, so the result is exact and the DuckDB oracle
    replays the identical peel — no convergence heuristic to diverge on
    (the fixed-round result is the true k-core whenever the peel
    reaches a fixed point, which the probe confirmed at both driver
    scales; deeper cascades cost one more round each, the
    degeneracy-ordering alternative being inherently sequential).

    Scale shape: each round is ONE map-side-combinable degree count
    plus TWO semi-joins of the edge list against the shrinking survivor
    set — 3 key-partitioned shuffles per round, node frames never
    exceed node count, and the edge list only ever SHRINKS. The edge
    frame is localCheckpoint-ed per round (the HITS trick): each round
    references its predecessor three times, so an unbroken lineage
    would grow the logical plan 3^rounds; the checkpoint keeps the plan
    round-sized and stops re-execution under the per-round jobs. Node
    ids are integer-encoded (c -> 2c, s -> 2s+1) end-to-end, labels
    projected only on the final rows (the pagerank lesson: integer keys
    shuffle several times faster than label strings).

    Reference basis: SURVEY.md §2.12 (graph family beyond the
    reference; the reference itself has no graph operators)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    pairs = (
        o.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_suppkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    fwd = pairs
    rev = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    alive = (
        fwd.unionAll(rev).repartition("src").dropDuplicates(["src", "dst"])
    ).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        keep = (
            alive.groupBy("src")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") >= KCORE_K)
            .select(F.col("src").alias("node"))
        )
        alive = (
            alive.join(keep, alive.src == keep.node, "left_semi")
            .join(
                keep.select(F.col("node").alias("dnode")),
                alive.dst == F.col("dnode"),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    return (
        alive.groupBy("src")
        .agg(F.count("*").alias("core_deg"))
        .select(
            F.expr(
                "case when src % 2 = 0 then 'c' || (src div 2)"
                " else 's' || (src div 2) end"
            ).alias("node"),
            "core_deg",
        )
    )


graph_k_core.__doc__ = graph_k_core.__doc__.format(K=KCORE_K, R=KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Bipartite squares (C4): supplier co-purchasing backbone via wedge join
# ---------------------------------------------------------------------------
SQ_DEG_CAP = 256  # customer-degree cap: a customer linking d suppliers
# emits C(d,2) wedges — capping d keeps the wedge fan-out linear in the
# edge count at any corpus size (the df-cap doctrine from the dedup
# family). The fixture's max degree is far below the cap, so the capped
# answer EQUALS the exact one here; at 100 TB the cap is the documented
# approximation knob (hub customers contribute connectivity, not signal).
SQ_TOPK = 20


@register(
    "graph_bipartite_squares",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    deg AS (
      SELECT c, COUNT(*) AS d FROM e GROUP BY c
    ),
    keep AS (
      SELECT e.c, e.s FROM e JOIN deg ON deg.c = e.c
      WHERE deg.d <= {SQ_DEG_CAP}
    ),
    wedges AS (
      SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS m
      FROM keep a JOIN keep b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT s1, s2, m AS common_customers,
           CAST(m * (m - 1) / 2 AS BIGINT) AS squares
    FROM wedges
    ORDER BY m DESC, s1, s2
    LIMIT {SQ_TOPK}
    """,
    tags=("graph", "join"),
)
def graph_bipartite_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier CO-PURCHASING backbone: for every supplier pair, how
    many customers buy from both (the wedge count m), and how many C4
    squares they anchor (C(m,2) — the bipartite graph's only cycle
    primitive, where triangles cannot exist). The top-{K} pairs by
    common-customer mass are the substitution/bundling candidates a
    marketplace watches; summed over all pairs, C(m,2) is the bipartite
    clustering numerator. One customer-keyed self-join emits each
    customer's C(d,2) supplier wedges — fan-out bounded by the
    {CAP}-degree cap (df-cap doctrine: hub customers contribute
    quadratic wedge volume and near-zero pair signal; the fixture never
    hits the cap, so the capped answer is exact here). Ties at the
    top-{K} cut break on the (s1, s2) key.

    Scale shape: distinct edge agg, degree filter, one key-partitioned
    wedge join (never all supplier pairs — only co-purchased ones),
    one TakeOrdered. Reference basis: SURVEY.md §2.3 join family
    (absent in reference)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        # e feeds the degree agg AND the degree-filter join, and keep
        # feeds BOTH wedge sides — without the checkpoints Catalyst
        # re-derives the distinct edge set four times (13 exchanges,
        # 4x the orders/lineitem scans; measured in the r13 plan
        # audit). The eager localCheckpoint is the HITS/k-core trick:
        # compute each frame once, read it everywhere.
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("c").agg(F.count("*").alias("d"))
    keep = (
        e.join(deg.filter(F.col("d") <= SQ_DEG_CAP), "c")
        .select("c", "s")
        .localCheckpoint(eager=True)
    )
    a = keep.select("c", F.col("s").alias("s1"))
    b = keep.select("c", F.col("s").alias("s2"))
    wedges = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("m"))
    )
    return (
        wedges.select(
            "s1",
            "s2",
            F.col("m").alias("common_customers"),
            (F.col("m") * (F.col("m") - 1) / 2).cast("long").alias(
                "squares"
            ),
        )
        .orderBy(F.desc("common_customers"), "s1", "s2")
        .limit(SQ_TOPK)
    )


graph_bipartite_squares.__doc__ = graph_bipartite_squares.__doc__.format(
    K=SQ_TOPK, CAP=SQ_DEG_CAP
)

"""Graph analytics queries (Pregel-as-join iterations over DataFrames).

Connected components live in operators/components.py (dedup_clusters);
this module adds centrality. The reference has no graph capability at
all; the target is the iterative-join pattern that scales as one hash
shuffle per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pagerank import DAMP_DEN, DAMP_NUM, SCALE, pagerank_fixed_point
from .registry import register, table

PR_ITER = 3
PR_TOPK = 20


def _pr_oracle() -> str:
    head = f"""
    WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
                                'p' || l_partkey AS dst FROM lineitem),
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
    SELECT node, CAST(r AS BIGINT) AS rank FROM it{PR_ITER}
    ORDER BY r DESC, node LIMIT {PR_TOPK}"""
    )


@register("graph_pagerank_lineitem", oracle=_pr_oracle(), tags=("graph", "iterative"))
def graph_pagerank_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} PageRank nodes of the (symmetrized) supplier<->part
    purchase graph from lineitem — {I} Pregel-as-join supersteps, one
    hash shuffle each (operators/pagerank.py). Fixed-point integer
    arithmetic makes the iteration order-independent, so the DuckDB
    oracle's unrolled replay hash-matches bit-for-bit — an EXACT
    correctness gate for an iterative graph algorithm. Ties in the top-k
    break on the node id."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_fixed_point(edges, PR_ITER)
    return ranks.orderBy(F.col("rank").desc(), "node").limit(PR_TOPK)

"""Correlated & scalar subqueries (TPC-H Q4/Q17/Q16 shapes) — completing
the relational surface of SURVEY.md §2.3-2.4.

Expressed through spark.sql over temp views: Catalyst decorrelates EXISTS /
IN / scalar-aggregate subqueries into joins (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery), so the physical plans are the same hash/broadcast
joins as the DataFrame API — declaring them as SQL exercises the
decorrelation path the reference entirely lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, table


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# EXISTS correlated subquery (TPC-H Q4 shape)
# ---------------------------------------------------------------------------
_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4, tags=("subquery", "exists", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-lineitem order counts: correlated EXISTS — Catalyst rewrites to
    a left-semi hash join on orderkey (one shuffle, no row explosion)."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4)


# ---------------------------------------------------------------------------
# Correlated scalar-aggregate subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q17_small_quantity", oracle=_Q17, tags=("subquery", "scalar", "agg"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue: correlated scalar AVG subquery — decorrelated
    into a per-partkey aggregate joined back (two-phase, no re-scan per
    row); part is broadcast."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17)


# ---------------------------------------------------------------------------
# NOT IN + grouped distinct (TPC-H Q16 shape)
# ---------------------------------------------------------------------------
_Q16 = """
SELECT p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM (
  SELECT p.p_type, p.p_size, l.l_suppkey AS ps_suppkey
  FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
  WHERE p.p_size IN (1, 2, 3, 4)
    AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
) t
GROUP BY p_type, p_size
"""


@register("q16_parts_suppliers", oracle=_Q16, tags=("subquery", "not_in", "agg"))
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier counts per part type/size excluding flagged suppliers:
    NOT IN -> null-aware anti join (broadcast: supplier is tiny);
    IN-list -> pushed-down OR predicate on the part scan."""
    _views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql(_Q16)


# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery + HAVING (TPC-H Q11 shape)
# ---------------------------------------------------------------------------
_Q11 = """
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > (
  SELECT 0.001 * SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem
)
"""


@register("q11_important_stock", oracle=_Q11, tags=("subquery", "having", "agg"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.1% of total: uncorrelated scalar
    subquery evaluated once and broadcast into the HAVING filter."""
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q11)

"""Skew-mitigation operators: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one platform, one null-ish address, one
viral document) can pin a whole stage on one task. First line of defense is
AQE skew-join splitting (on in session.py); these helpers cover the cases
AQE cannot fix:

- `salted_agg`: a hot-key GROUP BY — AQE cannot split a single group. Split
  it explicitly: stage 1 aggregates (key, salt) partial groups, stage 2
  merges per key. Works for any algebraic aggregate (sum/count/min/max
  re-aggregate losslessly).
- `salted_broadcast_join`: replicating the small side per salt keeps a
  skewed shuffle join balanced when the small side is too big for plain
  broadcast but small enough to replicate N times. (With a genuinely small
  side, prefer plain F.broadcast — Catalyst already avoids the shuffle.)

Salting uses a deterministic spread column (pmod of xxhash64 over a
uniqueifier) so results stay reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, uniqueifier: Column, buckets: int) -> DataFrame:
    """Add a deterministic __salt in [0, buckets): hash of a high-cardinality
    uniqueifier column (NOT rand() — keeps retries/oracles deterministic)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(uniqueifier), F.lit(buckets)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    uniqueifier: str,
    buckets: int,
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
) -> DataFrame:
    """Two-stage skew-proof aggregation:

    stage 1: groupBy(keys + salt)  -> partial sums/counts (salt spreads a
             hot key over `buckets` tasks)
    stage 2: groupBy(keys)         -> merge partials (tiny input)

    `sums` maps input column -> output alias (decimal-exact, so the result
    is bit-identical to the single-stage groupBy).
    """
    sums = sums or {}
    salted = with_salt(df, F.col(uniqueifier), buckets)
    partial_aggs = [
        F.sum(F.col(c).cast("decimal(18,2)")).alias(f"__p_{a}") for c, a in sums.items()
    ]
    if count_alias:
        partial_aggs.append(F.count("*").alias("__p_cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [
        F.sum(f"__p_{a}").cast("double").alias(a) for a in sums.values()
    ]
    if count_alias:
        final_aggs.append(F.sum("__p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    uniqueifier: str,
    buckets: int,
) -> DataFrame:
    """Skewed equi-join: salt the big side, explode the small side across
    all salt values, join on (key, salt). Each hot key's rows spread over
    `buckets` tasks instead of one."""
    salted_big = with_salt(big, F.col(uniqueifier), buckets)
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(exploded_small, [on, "__salt"]).drop("__salt")

"""Fuzzy (edit-distance) matching via deletion-neighborhood blocking.

The reference has no fuzzy matching at all — its joins are exact URL/id
equality (reference src/etl/merging.py) — but entity resolution over dirty
100 TB data needs approximate string joins, and the naive form is an
O(n^2) cross join with a per-pair edit-distance call.

The scalable plan (SymSpell / FastSS family): every string generates its
single-character *deletion neighborhood* (len+1 variant keys — each
position deleted once, plus the string itself). Two strings within
Levenshtein distance 1 ALWAYS share a variant:

- substitution at position p  -> deleting p from both yields the same key;
- insertion/deletion          -> deleting the extra char from the longer
                                 string yields the shorter string itself.

So an equi-join on the exploded variant key finds every candidate pair
(linear row expansion ~ avg_len, no cross join), `distinct` collapses
pairs that collide in several variants, and one exact `levenshtein` call
per *candidate* (not per pair in n^2) verifies. Catalyst plans the join
as an ordinary shuffled hash/sort-merge on the variant key, so it scales
out; block sizes stay tiny because a variant key is nearly as selective
as the string itself — unlike prefix-blocking, which degenerates when the
data shares a long common prefix (every c_name starts "Customer#").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deletion variants of `col`: position i deleted for i=1..len, plus the
#: string itself (the i=0 slot). Pure codegen — no UDF.
_VARIANTS = (
    "transform(sequence(0, length({c})), "
    "i -> IF(i = 0, {c}, concat(substr({c}, 1, i - 1), substr({c}, i + 1))))"
)


def deletion_variants(col_name: str):
    """Array column of the 1-deletion neighborhood of `col_name`."""
    return F.expr(_VARIANTS.format(c=col_name))


def fuzzy_selfjoin_dist1(df: DataFrame, key: str, text: str) -> DataFrame:
    """All pairs (a < b by `key`) whose `text` values are within
    Levenshtein distance 1. Returns key_a, key_b, text_a, text_b, dist."""
    exploded = df.select(
        F.col(key).alias("k"),
        F.col(text).alias("t"),
        F.explode(deletion_variants(text)).alias("variant"),
    )
    right = exploded.select(
        F.col("k").alias("k2"), F.col("t").alias("t2"), "variant"
    )
    cands = (
        exploded.join(right, "variant")
        .filter(F.col("k") < F.col("k2"))
        .select("k", "k2", "t", "t2")
        .distinct()
    )
    return cands.filter(F.levenshtein("t", "t2") <= 1).select(
        F.col("k").alias("key_a"),
        F.col("k2").alias("key_b"),
        F.col("t").alias("text_a"),
        F.col("t2").alias("text_b"),
        F.levenshtein("t", "t2").alias("dist"),
    )

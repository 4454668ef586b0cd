"""Bloom-filter semi-join reduction (shuffle-avoiding join prefilter).

At 100 TB the dominant cost of `big SEMI JOIN dim` is shuffling the big
side. When the dim key set is too large to broadcast exactly but its
*Bloom filter* is not, ship the filter instead: probe rows that fail the
filter are discarded BEFORE the shuffle, and only survivors (true matches
+ a small false-positive fraction) pay it — the classic semi-join
reduction Spark's own runtime row-level filtering performs when its
internal `bloom_filter_agg` kicks in (not user-invokable from SQL here,
so this operator builds the same structure from public primitives).

Representation: the m-bit filter is a tiny DataFrame of 64-bit words
`(w, bits)` — built with one hash-aggregate over the dim keys (explode of
k positions -> group by word -> BIT_OR), never collected to the driver.
Probing is k broadcast-hash joins on the word index plus a bitwise AND —
all JVM codegen, no UDF. Missing words (no join hit) mean 0-bits, so the
join is left + IS NOT NULL guard.

The filter is probabilistic with NO false negatives; callers follow with
the exact join, so results are always exact — the bloom stage only
shrinks the shuffle. FPR ~ (1 - e^(-kn/m))^k; pick m ~ 10 bits/key,
k = 3 for ~1-2%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(key_col: str, seed: int, m_bits: int):
    """i-th bloom position: seeded xxhash64 mod m (seed mixed in as an
    extra hashed column — xxhash64 is a multi-arg hash)."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(m_bits))


def build_bloom_words(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Aggregate the dim key set into bloom words (w, bits): one explode of
    k positions per key, one hash-agg with BIT_OR. At m = 2^20, the result
    is <= 16384 rows (~128 KB) regardless of dim size."""
    pos = dim.select(
        F.explode(
            F.array(*[_position(key_col, i, m_bits) for i in range(k)])
        ).alias("p")
    )
    # shiftleft by a COLUMN is SQL-only (the python helper wants an int)
    return (
        pos.select(
            F.shiftright("p", 6).alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_prefilter(
    big: DataFrame, key_col: str, words: DataFrame, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Keep only big-side rows whose key passes the bloom filter: k
    broadcast joins on the word index + bitwise membership tests. Never
    drops a true match; lets a small FPR fraction through (the exact join
    downstream removes it)."""
    out = big
    for i in range(k):
        pcol, wcol, bits_col = f"__bp{i}", f"__bw{i}", f"__bbits{i}"
        probe = words.select(
            F.col("w").alias(wcol), F.col("bits").alias(bits_col)
        )
        out = (
            out.withColumn(pcol, _position(key_col, i, m_bits))
            .withColumn(wcol, F.shiftright(pcol, 6))
            .withColumn(
                f"__bm{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({pcol}, 64) AS INT))"
                ),
            )
            .join(F.broadcast(probe), wcol, "left")
            .filter(
                F.col(bits_col).isNotNull()
                & (F.col(bits_col).bitwiseAND(F.col(f"__bm{i}")) != 0)
            )
            .drop(pcol, wcol, bits_col, f"__bm{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame, dim: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Exact semi join with a bloom prefilter on the big side: bloom pass
    shrinks the shuffle, the final left-semi join guarantees exactness."""
    words = build_bloom_words(dim, key_col, m_bits, k)
    reduced = bloom_prefilter(big, key_col, words, m_bits, k)
    return reduced.join(dim.select(key_col).distinct(), key_col, "left_semi")

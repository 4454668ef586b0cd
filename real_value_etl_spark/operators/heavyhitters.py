"""Heavy hitters via the Misra-Gries mergeable summary (sketch + verify).

Exact "most frequent tokens" over a 100 TB corpus needs a full group-by on
every token — fine, Spark does it — but the *streaming/bounded-memory*
form matters when the token universe is huge (trillions of distinct
n-grams): Misra-Gries keeps at most k counters per partition, one pass,
O(k) memory, and guarantees every item with true frequency > n/k survives.

Distribution argument (mergeable-summaries result): if an item's GLOBAL
frequency exceeds n/k, then by pigeonhole its frequency exceeds n_p/k in
at least one partition, so it survives that partition's local sketch —
the union of per-partition candidates is a superset of the true heavy
hitters. A second exact pass counts ONLY the candidates (broadcast semi
join, tiny) and filters by the true threshold, so the final answer is
EXACT — the sketch merely bounds the memory of pass 1 and shrinks pass 2.

The local sketch runs in `mapInPandas` (Arrow batches, one dict of <= 2k
counters per partition — the sanctioned Python extension point for
genuinely imperative per-partition state; everything around it stays in
Catalyst).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_kernel(k: int):
    """Partition-local Misra-Gries over a stream of single-column token
    batches; emits the surviving (token, weight) counters at end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for batch in batches:
            for tok in batch["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:  # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"token": list(counters), "weight": list(counters.values())}
        )

    return run


def heavy_hitters_exact(tokens: DataFrame, token_col: str, k: int) -> DataFrame:
    """All tokens with exact frequency > n/k, found with a bounded-memory
    candidate pass + exact recount of candidates only.

    `tokens` is one row per token occurrence. Returns (token, freq).
    """
    toks = tokens.select(F.col(token_col).alias("token"))
    cands = (
        toks.mapInPandas(_mg_kernel(k), "token string, weight long")
        .select("token")
        .distinct()
    )
    total = toks.count()
    exact = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    return exact.filter(F.col("freq") * k > F.lit(total))

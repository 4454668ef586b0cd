#!/usr/bin/env python
"""Same-session interleaved A/B for the hash-keyed candidate join
(r12 optimization, second session): the prefix-filtered Jaccard
pipeline with the candidate self-join keyed on xxhash64(sh) (NEW, the
shipped code) vs keyed on the shingle string (OLD, reconstructed
inline). min-of-N, noop sink, cache cleared per run.

    python tools/r12_hashcand_probe.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from real_value_etl_spark.operators.dedup import (
        _packed_prefix_docsets,
        ngram_jaccard_pairs_prefix,
        shingle_index,
    )
    from real_value_etl_spark.queries.llm import JACCARD_THRESHOLD
    from real_value_etl_spark.queries.registry import table
    from real_value_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    )
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    t = float(JACCARD_THRESHOLD)
    spark = get_spark(app_name="r12-hashcand-probe")
    docs = table(spark, sf_dir, "documents")

    def old_query():
        """The pre-change tail: candidate join keyed on the STRING."""
        idx = shingle_index(docs, "doc_id", "text")
        packed = _packed_prefix_docsets(idx, t)
        pf = packed.select(
            "did",
            "n",
            F.posexplode(F.slice("shs", F.lit(1), F.col("p"))).alias(
                "pos", "sh"
            ),
        )
        a, b = pf.alias("a"), pf.alias("b")
        ub = F.lit(1.0) + F.least(
            F.col("a.n") - F.col("a.pos") - 1,
            F.col("b.n") - F.col("b.pos") - 1,
        )
        cands = (
            a.join(
                b,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.did") < F.col("b.did"))
                & (F.col("b.n") >= F.lit(t) * F.col("a.n"))
                & (F.col("a.n") >= F.lit(t) * F.col("b.n"))
                & (
                    F.lit(1.0 + t) * ub
                    >= F.lit(t) * (F.col("a.n") + F.col("b.n"))
                ),
            )
            .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
            .distinct()
        )
        sa = packed.select(
            F.col("did").alias("doc_a"),
            F.col("shs").alias("shs_a"),
            F.col("n").alias("n_a"),
        ).hint("shuffle_hash")
        sb = packed.select(
            F.col("did").alias("doc_b"),
            F.col("shs").alias("shs_b"),
            F.col("n").alias("n_b"),
        ).hint("shuffle_hash")
        inter = F.size(
            F.array_intersect(F.col("shs_a"), F.col("shs_b"))
        ).cast("double")
        return (
            cands.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jac"),
            )
            .filter(F.col("jac") >= t)
        )

    def new_query():
        return ngram_jaccard_pairs_prefix(docs, "doc_id", "text", t)

    def timed(fn) -> float:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    n_old = old_query().count()
    n_new = new_query().count()
    print(f"# rows old={n_old} new={n_new} match={n_old == n_new}")

    olds, news = [], []
    for i in range(n_rounds):
        spark.sparkContext.setJobDescription(f"cand-key OLD(string) {i}")
        olds.append(timed(old_query))
        spark.sparkContext.setJobDescription(f"cand-key NEW(hash) {i}")
        news.append(timed(new_query))
        print(f"# round {i}: old={olds[-1]} new={news[-1]}")
    print(
        f"OLD(string-key) min={min(olds)} readings={olds}\n"
        f"NEW(hash-key)   min={min(news)} readings={news}\n"
        f"speedup(min/min)={min(olds) / min(news):.2f}x"
    )


if __name__ == "__main__":
    main()

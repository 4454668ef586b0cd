#!/usr/bin/env python
"""Same-session interleaved A/B probe for the docs_rouge2_pairs overlap
rewrite (r12 optimization round): OLD (pair x bigram explode join +
re-aggregation + two totals joins) vs NEW (packed per-doc bigram-count
maps + map_zip_with multiset intersection).

Protocol (OPTIMIZATION_r12.md "Measurement honesty"): this host flaps
2-4x on minute scales, so decisions rest on SAME-SESSION interleaved
min-of-N, never cross-session absolute readings. Timed action = noop
sink (guide §1.4) so the sink never confounds the comparison.

    python tools/r12_rouge2_probe.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from real_value_etl_spark.operators import dedup as D
    from real_value_etl_spark.functions import text as T
    from real_value_etl_spark.queries.llm import JACCARD_THRESHOLD
    from real_value_etl_spark.queries.registry import REGISTRY, table
    from real_value_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    )
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="r12-rouge2-probe")

    docs = table(spark, sf_dir, "documents")

    def pairs_df():
        return D.ngram_jaccard_pairs(
            docs, "doc_id", "text", JACCARD_THRESHOLD
        ).select("doc_a", "doc_b", "jac")

    def ts_df():
        return docs.select("doc_id", T.tokens(F.col("text")).alias("ts"))

    def bg_df():
        return (
            ts_df()
            .select(
                "doc_id",
                F.explode(
                    F.when(
                        F.size("ts") >= 2,
                        F.expr(
                            "transform(sequence(0, size(ts) - 2), "
                            "i -> concat(element_at(ts, i + 1), ' ', "
                            "element_at(ts, i + 2)))"
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                ).alias("bgr"),
            )
            .groupBy("doc_id", "bgr")
            .agg(F.count("*").alias("c"))
        )

    def old_query():
        """The pre-r12 formulation, reconstructed verbatim."""
        pairs = pairs_df()
        bg = bg_df().localCheckpoint(eager=True)
        tot = bg.groupBy("doc_id").agg(F.sum("c").alias("nb"))
        a = bg.select(
            F.col("doc_id").alias("doc_a"), "bgr", F.col("c").alias("ca")
        )
        b = bg.select(
            F.col("doc_id").alias("doc_b"), "bgr", F.col("c").alias("cb")
        )
        ov = (
            pairs.join(a, "doc_a")
            .join(b, ["doc_b", "bgr"])
            .groupBy("doc_a", "doc_b", "jac")
            .agg(F.sum(F.least("ca", "cb")).alias("overlap"))
        )
        ta = tot.select(
            F.col("doc_id").alias("doc_a"), F.col("nb").alias("n_bigrams_a")
        )
        tb = tot.select(
            F.col("doc_id").alias("doc_b"), F.col("nb").alias("n_bigrams_b")
        )
        return (
            ov.join(ta, "doc_a")
            .join(tb, "doc_b")
            .select(
                "doc_a", "doc_b", "jac",
                F.col("overlap").alias("bigram_overlap"),
                "n_bigrams_a", "n_bigrams_b",
                (F.col("overlap").cast("double") / F.col("n_bigrams_a")).alias("rouge2_p"),
                (F.col("overlap").cast("double") / F.col("n_bigrams_b")).alias("rouge2_r"),
                (F.lit(2.0) * F.col("overlap") / (F.col("n_bigrams_a") + F.col("n_bigrams_b"))).alias("rouge2_f"),
            )
        )

    def new_query():
        return REGISTRY["docs_rouge2_pairs"].fn(spark, sf_dir)

    def timed(fn) -> float:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # row parity first: the probe doubles as an at-scale equivalence check
    n_old = old_query().count()
    n_new = new_query().count()
    print(f"# rows old={n_old} new={n_new} match={n_old == n_new}")

    olds, news = [], []
    for i in range(n_rounds):
        spark.sparkContext.setJobDescription(f"rouge2 OLD round {i}")
        olds.append(timed(old_query))
        spark.sparkContext.setJobDescription(f"rouge2 NEW round {i}")
        news.append(timed(new_query))
        print(f"# round {i}: old={olds[-1]} new={news[-1]}")
    print(
        f"OLD min={min(olds)} readings={olds}\n"
        f"NEW min={min(news)} readings={news}\n"
        f"speedup(min/min)={min(olds) / min(news):.2f}x"
    )


if __name__ == "__main__":
    main()

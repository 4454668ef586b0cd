#!/usr/bin/env python
"""Same-session interleaved A/B for the phash hamming<=1 pair join
(r12 optimization, second session): XOR-bit-flip enumeration (NEW, the
shipped code) vs the 2x8-bit banded self-join + distinct (OLD,
reconstructed inline). min-of-N, noop sink, cache cleared per run.

    python tools/r12_phash_probe.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from real_value_etl_spark.queries import all_queries  # noqa: F401 (registers the registry; retrieval_graph needs it first)
    from real_value_etl_spark.operators import multimodal as M
    from real_value_etl_spark.queries.registry import REGISTRY, table
    from real_value_etl_spark.queries.retrieval_graph import (
        PHASH_BAND_BITS,
        PHASH_MAX_HAMMING,
    )
    from real_value_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    )
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="r12-phash-probe")
    d = table(spark, sf_dir, "documents")

    def phashes():
        feats = M.extract_features(
            M.encode_png_gray(M.attach_binary(d, "doc_id", "text"))
        )
        return feats.groupBy("doc_id").agg(
            F.sum(
                F.when(
                    F.col("block_sum") * F.col("total_n")
                    >= F.col("total_sum") * F.col("block_n"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), feature_idx)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("phash")
        )

    def old_query():
        """The pre-change banded self-join + distinct."""
        ph = phashes()
        bands = ph.select(
            "doc_id",
            "phash",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("band"),
                        (F.col("phash") % 256).alias("bkey"),
                    ),
                    F.struct(
                        F.lit(1).alias("band"),
                        F.shiftright(F.col("phash"), PHASH_BAND_BITS).alias(
                            "bkey"
                        ),
                    ),
                )
            ).alias("bk"),
        ).select(
            "doc_id",
            "phash",
            F.col("bk.band").alias("band"),
            F.col("bk.bkey").alias("bkey"),
        )
        x, y = bands.alias("x"), bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bkey") == F.col("y.bkey"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("x.phash").alias("ph_a"),
                F.col("y.doc_id").alias("doc_b"),
                F.col("y.phash").alias("ph_b"),
            )
            .distinct()
        )
        hamming = F.bit_count(
            F.col("ph_a").bitwiseXOR(F.col("ph_b"))
        ).cast("long")
        return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
            F.col("hamming") <= PHASH_MAX_HAMMING
        )

    def new_query():
        return REGISTRY["multimodal_phash_dedup"].fn(spark, sf_dir)

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
        spark.sparkContext.setJobDescription(f"phash OLD(banded) {i}")
        olds.append(timed(old_query))
        spark.sparkContext.setJobDescription(f"phash NEW(xor-enum) {i}")
        news.append(timed(new_query))
        print(f"# round {i}: old={olds[-1]} new={news[-1]}")
    print(
        f"OLD(banded)   min={min(olds)} readings={olds}\n"
        f"NEW(xor-enum) min={min(news)} readings={news}\n"
        f"speedup(min/min)={min(olds) / min(news):.2f}x"
    )


if __name__ == "__main__":
    main()

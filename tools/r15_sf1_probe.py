#!/usr/bin/env python
"""Round-15 sf1 hand-probe (VERDICT r11 ask #6 + this round's additions):
time sim_radius_search — the highest non-refuted sf1 ratio on record
(8.34x / e 0.92, r17) — WITH its output decomposition (hit-row count and
per-ball population at both scales), so the ratio can be attributed to
output-pair growth (the query set is capped, the corpus grows 10x, so a
radius ball's population grows ~10x and the output is the cost) or
flagged as a real plan problem. Also probes the round-12 rework/additions
at sf1. graph_components_star rides as the contention control (r9-r13
quiet band: ~3.0-5.5x)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "sim_radius_search",
    "multimodal_inflate_dynamic_huffman",
    "multimodal_resize",
    "multimodal_features",
    "multimodal_phash_dedup",
    "docs_quality_funnel",
]


def timed(spark, name, sf, n=2):
    spec = REGISTRY[name]
    spark.catalog.clearCache()
    spec.fn(spark, sf).count()  # warm
    reads = []
    for _ in range(n):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, sf).count()
        reads.append(round(time.perf_counter() - t0, 3))
    return min(reads), reads


def radius_decomposition(spark, sf):
    df = REGISTRY["sim_radius_search"].fn(spark, sf)
    row = df.agg(
        F.count("*").alias("hits"),
        F.countDistinct("qid").alias("balls"),
        F.max("n_within").alias("max_ball"),
    ).first()
    return row.hits, row.balls, row.max_ball


def main() -> None:
    spark = get_spark(app_name="r15-sf1-probe", shuffle_partitions=32)
    sf1 = ensure_sf1()
    names = sys.argv[1:] or QUERIES
    for name in names:
        b, br = timed(spark, name, "/root/testdata/sf0.1")
        s, sr = timed(spark, name, sf1)
        line = (
            f"{name}: sf0.1 {b:.3f}s {br} -> sf1 {s:.3f}s {sr} "
            f"ratio {s / b:.2f}x"
        )
        if name == "sim_radius_search":
            h0 = radius_decomposition(spark, "/root/testdata/sf0.1")
            h1 = radius_decomposition(spark, sf1)
            line += (
                f" | hits {h0[0]} -> {h1[0]} ({h1[0] / max(h0[0], 1):.2f}x),"
                f" balls {h0[1]} -> {h1[1]},"
                f" max_ball {h0[2]} -> {h1[2]}"
            )
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

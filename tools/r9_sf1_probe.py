#!/usr/bin/env python
"""Round-9 pre-admission sf1 hand-probe (the r7/r8 pattern): time the
new operators at sf0.1 and the synthesized sf1 before deciding which
join SF1_HEAVY. Run in a quiet window; graph_components_star rides as
the contention control."""
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control (quiet base 4.35 s at sf0.1)
    "graph_k_core",
    "sim_mmr_rerank",
    "events_max_burst_interval",
    "events_holt_winters",
    "multimodal_png_idat_parse",
    "multimodal_mp3_frame_walk",
    "stream_countmin",
    "q_hll_set_ops",
    "docs_rep_ngram_coverage",
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


def main():
    spark = get_spark(app_name="r9-sf1-probe")
    sf01 = "/root/testdata/sf0.1"
    sf1 = ensure_sf1()
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf01}/{t}.parquet").count()
    out = {}
    for name in QUERIES:
        a, ra = timed(spark, name, sf01)
        b, rb = timed(spark, name, sf1)
        out[name] = (a, b, round(b / a, 2))
        print(f"{name}: sf0.1 {a}s {ra} | sf1 {b}s {rb} | ratio {b/a:.2f}",
              flush=True)
    print(out)


if __name__ == "__main__":
    main()

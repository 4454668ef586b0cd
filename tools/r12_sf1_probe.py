#!/usr/bin/env python
"""Round-12 pre-admission sf1 hand-probe (the r7-r11 pattern): time the
new operators at sf0.1 and the synthesized sf1 before deciding which
join SF1_HEAVY. Run in a quiet window; graph_components_star rides as
the contention control. Flat probes are recorded in COVERAGE.md as
non-admissions, not given bench legs (the r9 graph_k_core lesson).

Fixture notes that pre-decide some rows: orders is UNSCALED in the sf1
fixture (tools/make_sf1.py), so the orders-based round-12 stats
(q_ks_two_sample, q_cramers_v, q_welch_t_test, events_friedman_test's
day grid) cannot show growth there by construction — they are probed
only to confirm flatness, never admissible on this fixture. lineitem,
documents, embeddings, and events ARE tiled 10x, so q_mann_whitney,
text_suffix_lcp_dedup, docs_tv_distance, the graph ops, sim_kcenter_
seeds, and stream_moments see real 10x inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "text_suffix_lcp_dedup",
    "docs_tv_distance",
    "q_mann_whitney",
    "sim_kcenter_seeds",
    "graph_katz_centrality",
    "graph_edge_jaccard",
    "graph_double_sweep",
    "stream_moments",
    "q_ks_two_sample",
    "q_welch_t_test",
    "events_theil_sen",
    "events_kendall_tau",
    "events_friedman_test",
    "multimodal_gif_frame_walk",
    "multimodal_ico_parse",
    "multimodal_png_crc32",
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


def main() -> None:
    spark = get_spark(app_name="r12-sf1-probe", shuffle_partitions=32)
    sf1 = ensure_sf1()
    names = sys.argv[1:] or QUERIES
    for name in names:
        b, br = timed(spark, name, "/root/testdata/sf0.1")
        s, sr = timed(spark, name, sf1)
        print(
            f"{name}: sf0.1 {b:.3f}s {br} -> sf1 {s:.3f}s {sr} "
            f"ratio {s / b:.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-11 pre-admission sf1 hand-probe (the r7-r10 pattern): time the
new operators at sf0.1 and the synthesized sf1 before deciding which
join SF1_HEAVY. Run in a quiet window; graph_components_star rides as
the contention control. Flat probes are recorded in COVERAGE.md as
non-admissions, not given bench legs (the r9 graph_k_core lesson: a
fixture that saturates understates growth and overstates evidence)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "graph_modularity",
    "graph_resource_allocation",
    "graph_path_counts",
    "graph_degree_assortativity",
    "graph_rich_club",
    "events_bootstrap_ci",
    "events_runs_test",
    "docs_simpson_diversity",
    "q_hoover_index",
    "q_benford_audit",
    "multimodal_tar_header_parse",
    "stream_minmax_witness",
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
    spark = get_spark(app_name="r11-sf1-probe", shuffle_partitions=32)
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


if __name__ == "__main__":
    main()

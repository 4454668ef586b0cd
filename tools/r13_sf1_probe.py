#!/usr/bin/env python
"""Round-13 pre-admission sf1 hand-probe (the r7-r12 pattern): time the
new operators at sf0.1 and the synthesized sf1 before deciding which
join SF1_HEAVY. Run in a quiet window; graph_components_star rides as
the contention control. Flat probes are recorded in COVERAGE.md as
non-admissions, not given bench legs.

Fixture notes: orders is UNSCALED in the sf1 fixture, so the orders-
based round-13 stats (q_kruskal_wallis, q_cliffs_delta, q_mcnemar,
q_cramer_von_mises, q_jonckheere_terpstra) are probed only to confirm
flatness — never admissible on this fixture. lineitem, documents, and
events ARE tiled 10x, so q_spearman_rho (distinct-price rank join),
q_jarque_bera / q_ols_price_on_qty / q_extreme_studentized (lineitem
scalar passes), graph_bipartite_squares (wedge join), text_yule_k /
text_burrows_delta (token aggs), events_hurst_rs / events_ordinal_
patterns (spine windows), and stream_ams_f2 (x16 ingest fan-out) see
real 10x inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "q_spearman_rho",
    "graph_bipartite_squares",
    "text_burrows_delta",
    "text_yule_k",
    "events_hurst_rs",
    "events_ordinal_patterns",
    "stream_ams_f2",
    "q_jarque_bera",
    "q_ols_price_on_qty",
    "q_extreme_studentized",
    "q_kruskal_wallis",
    "q_cramer_von_mises",
    "q_jonckheere_terpstra",
    "events_cochran_q",
    "multimodal_gzip_member_parse",
    "multimodal_midi_track_walk",
    "multimodal_elf_section_walk",
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
    spark = get_spark(app_name="r13-sf1-probe", shuffle_partitions=32)
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

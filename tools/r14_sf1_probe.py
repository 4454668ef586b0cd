#!/usr/bin/env python
"""Round-14 pre-admission sf1 hand-probe (the r7-r13 pattern): time this
round's new operators — and the two r12/r13 heavies VERDICT r10 ask #7
flagged as having no sf1 leg (docs_rouge2_pairs rebuilds a corpus-wide
bigram frame into an LSH-scoped pair join; text_burrows_delta rebuilds
the corpus z-score frame per author pair) — at sf0.1 and the synthesized
sf1 before deciding which join SF1_HEAVY. Run in a quiet window;
graph_components_star rides as the contention control (compare its ratio
against the r9-r13 quiet band of ~3.0-5.5x before believing anything
else in the run).

Fixture notes: documents is tiled 10x, so docs_rouge2_pairs /
text_burrows_delta / docs_url_dedup / docs_domain_caps /
multimodal_png_decode_gray / multimodal_decode all see a real 10x
corpus. The URL family's group structure (identity = doc_id % 50) keeps
the variant-group COUNT fixed at 50 while group SIZE grows 10x — the
per-domain rank and the normalized-key aggregate are the growing stages.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "docs_rouge2_pairs",
    "text_burrows_delta",
    "multimodal_png_decode_gray",
    "multimodal_decode",
    "docs_url_dedup",
    "docs_domain_caps",
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
    spark = get_spark(app_name="r14-sf1-probe", shuffle_partitions=32)
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

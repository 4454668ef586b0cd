#!/usr/bin/env python
"""Round-16 sf1 hand-probe: the three container-decode additions
(gzip member inflate, ZIP entry extraction, WET gzip->WARC extract) at
sf0.1 -> sf1, with graph_components_star as the contention control
(r9-r13 quiet band: ~3.0-5.5x). All three ride the interpreted
catalyst_inflate_hex fold, whose per-doc cost is fixed — the expected
shape is the multimodal_inflate_dynamic_huffman record (6.89x for 10x
docs, sub-linear), which keeps them out of SF1_HEAVY under the standing
codec rule; this probe records the evidence."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark
from tools.make_sf1 import ensure_sf1

QUERIES = [
    "graph_components_star",  # control
    "multimodal_gzip_inflate",
    "multimodal_zip_extract",
    "multimodal_warc_gzip_extract",
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
    spark = get_spark(app_name="r16-sf1-probe", shuffle_partitions=32)
    sf1 = ensure_sf1()
    sf01 = "/root/testdata/sf0.1"
    for name in QUERIES:
        b, br = timed(spark, name, sf01)
        s, sr = timed(spark, name, sf1)
        print(
            f"{name}: sf0.1 {b:.3f}s {br} -> sf1 {s:.3f}s {sr} "
            f"ratio {s / b:.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

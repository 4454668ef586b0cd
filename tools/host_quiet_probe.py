#!/usr/bin/env python
"""30-second host-quietness check: run bench.py's q1 control probe
(2 warm + min-of-3 timed at sf0.1) and compare against the trailing
median across committed non-noisy BENCH_LOCAL artifacts. Use before
launching a 45-minute full bench: if this prints NOISY, don't bother —
the artifact would be stamped noisy:true anyway (bench.py re-checks)."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_value_etl_spark.queries.all_queries import REGISTRY
from real_value_etl_spark.session import get_spark


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trailing = []
    for f in sorted(glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if d.get("noisy"):
            continue
        v = d.get("queries", {}).get("q1_pricing_summary")
        if v:
            trailing.append(float(v))
    if not trailing:
        # No quiet artifacts yet (all stamped noisy, or a fresh clone):
        # nothing to compare against — mirror bench.py's `if trailing:`
        # guard instead of crashing on an empty median.
        print("no quiet BENCH_LOCAL baseline found -> no verdict")
        return
    trailing.sort()
    med = (
        trailing[len(trailing) // 2]
        if len(trailing) % 2
        else (trailing[len(trailing) // 2 - 1] + trailing[len(trailing) // 2]) / 2
    )
    spark = get_spark(app_name="quiet-probe", shuffle_partitions=32)
    spec = REGISTRY["q1_pricing_summary"]
    sf = "/root/testdata/sf0.1"
    for _ in range(2):
        spark.catalog.clearCache()
        spec.fn(spark, sf).count()
    reads = []
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, sf).count()
        reads.append(round(time.perf_counter() - t0, 4))
    sec = min(reads)
    dev = sec / med - 1.0
    print(
        f"q1 {sec:.3f}s (readings {reads}) vs trailing median {med:.3f}s "
        f"-> {dev:+.1%}: {'NOISY' if dev > 0.25 else 'QUIET'}"
    )
    spark.stop()


if __name__ == "__main__":
    main()

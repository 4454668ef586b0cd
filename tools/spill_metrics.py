#!/usr/bin/env python
"""Per-stage shuffle/spill metrics at two scales (VERDICT r6 ask #5).

The bench-decade tails of `docs_span_pair_dedup` (sf0.1 -> sf1 wall ratio
8.38 for 10x data) and `dedup_jaccard_prefix` (sf1 -> sf10 wall exponent
1.11) were ARGUED to be single-JVM GC/heap pressure, not algorithmic
growth, on the strength of audited logical stage volumes (candidate
pairs / span-index rows exactly 10.0x for 10x data). This probe turns
the argument into a measurement: it runs each query at two scales,
captures every stage's shuffle read/write bytes and memory/disk spill
from the Spark status REST API, and prints the byte ratios next to the
wall ratio. If bytes scale ~linearly (ratio ~= 10) while wall scales
worse, the overage is the fixed-heap JVM paying GC for a working set
that on a real cluster is spread across executors — a watch item, not a
plan defect. Run by hand (the sf10 leg costs minutes):

    python tools/spill_metrics.py

Prints one JSON line per (query, scale) plus a summary block; paste the
summary into COVERAGE.md when the numbers move.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [
    # (query, small scale label, big scale label) — one decade each, the
    # decade whose wall tail the r6 verdict flagged
    ("docs_span_pair_dedup", "sf0.1", "sf1"),
    ("dedup_jaccard_prefix", "sf1", "sf10"),
]

UI = "http://localhost:4040/api/v1"


def _stages() -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{UI}/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{UI}/applications/{app_id}/stages?status=complete")
    )


def _totals(stages: list[dict]) -> dict[str, int]:
    out = {"shuffle_write": 0, "shuffle_read": 0, "mem_spill": 0,
           "disk_spill": 0, "input_bytes": 0}
    for s in stages:
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["mem_spill"] += s.get("memoryBytesSpilled", 0)
        out["disk_spill"] += s.get("diskBytesSpilled", 0)
        out["input_bytes"] += s.get("inputBytes", 0)
    return out


def main() -> None:
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY
    from real_value_etl_spark.session import get_spark
    from tools.make_sf1 import ensure_sf1, ensure_sf10

    spark = get_spark(
        app_name="rve-spill-probe",
        extra_conf={
            "spark.ui.enabled": "true",  # status REST API for stage metrics
            "spark.ui.retainedStages": "10000",  # don't evict probe stages
        },
    )
    dirs = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": ensure_sf1(),
        "sf10": ensure_sf10(),
    }

    results: dict[str, dict[str, dict]] = {}
    for name, small, big in PAIRS:
        spec = REGISTRY[name]
        results[name] = {}
        for label in (small, big):
            d = dirs[label]
            spark.catalog.clearCache()
            spec.fn(spark, d).count()  # warm: JIT + AQE sizes
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            before = {s["stageId"] for s in _stages()}
            t0 = time.perf_counter()
            spec.fn(spark, d).count()
            wall = time.perf_counter() - t0
            new = [s for s in _stages() if s["stageId"] not in before]
            row = _totals(new)
            row["wall_sec"] = round(wall, 3)
            row["n_stages"] = len(new)
            results[name][label] = row
            print(json.dumps({"query": name, "scale": label, **row}))

        s, b = results[name][small], results[name][big]

        def ratio(k: str) -> float | None:
            return round(b[k] / s[k], 2) if s.get(k) else None

        print(json.dumps({
            "query": name,
            "decade": f"{small}->{big}",
            "wall_ratio": round(b["wall_sec"] / s["wall_sec"], 2),
            "shuffle_write_ratio": ratio("shuffle_write"),
            "shuffle_read_ratio": ratio("shuffle_read"),
            "spill_small": s["mem_spill"] + s["disk_spill"],
            "spill_big": b["mem_spill"] + b["disk_spill"],
        }))
    spark.stop()


if __name__ == "__main__":
    main()

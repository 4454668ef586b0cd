#!/usr/bin/env python
"""Shared jaccard-pair materialization probe (VERDICT r7 ask #8).

`dedup_clusters`, `graph_components_star`, `dedup_bcubed_eval` and
`docs_leakage_safe_split` each rebuild the same n-gram Jaccard pair graph
from scratch. This probe measures, at sf0.1, the four queries (a) as
shipped and (b) with `operators.dedup.ngram_jaccard_pairs` memoized onto
one persisted pair frame per (id_col, text_col, threshold) — the
suite-context win an opt-in cached-intermediate layer could harvest.

Run in a quiet window; prints per-query timings and the go/no-go summary
to paste into COVERAGE.md.

    python tools/shared_pairs_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "dedup_clusters",
    "graph_components_star",
    "dedup_bcubed_eval",
    "docs_leakage_safe_split",
)


def time_suite(spark, registry, warm: int = 1) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in QUERIES:
        spec = registry[name]
        for _ in range(warm):
            spec.fn(spark, SF_DIR).count()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"#   {name}: {out[name]:.3f}s", file=sys.stderr)
    return out


def main() -> None:
    from real_value_etl_spark.operators import dedup as D
    from real_value_etl_spark.queries.all_queries import REGISTRY
    from real_value_etl_spark.session import get_spark

    spark = get_spark(app_name="rve-shared-pairs-probe")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm I/O

    print("# baseline (per-query rebuild, caches cleared):", file=sys.stderr)
    spark.catalog.clearCache()
    base = time_suite(spark, REGISTRY)
    spark.catalog.clearCache()

    print("# shared (one persisted pair frame):", file=sys.stderr)
    with D.shared_pair_cache():
        shared_t = time_suite(spark, REGISTRY, warm=0)

    total_base = sum(base.values())
    total_shared = sum(shared_t.values())
    print(f"# baseline total: {total_base:.2f}s", file=sys.stderr)
    print(
        f"# shared total:   {total_shared:.2f}s "
        f"({100 * (1 - total_shared / total_base):.0f}% saved)",
        file=sys.stderr,
    )
    import json

    print(json.dumps({"baseline": base, "shared": shared_t}))


if __name__ == "__main__":
    main()

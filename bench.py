#!/usr/bin/env python
"""Headline benchmark: run registered benchmark queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed once after a session warm-up; timing covers the full
action (plan + execute + collect) since that is what a user pays.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, heaviest plans in the registry.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q_top_customers",
    "q_window_order_rank",
    "q_rollup_returnflag",
    "q_ship_lag",
    # appended as families land (llm/dedup/events); missing names skipped
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_embedding_topk",
    "text_quality_score",
    "events_tumbling_agg",
    "events_sessionize",
    "asof_purchase_login",
]


def main() -> None:
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY
    from real_value_etl_spark.session import get_spark

    spark = get_spark(app_name="rve-bench")
    # warm-up: JVM + parquet footer caches, not measured
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count() if "stream" not in spec.tags else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries into plans/r12/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: the bench
HEADLINE list). Plan generation is driver-side only — safe to run while
other work occupies the executors.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY
    from real_value_etl_spark.session import get_spark

    names = sys.argv[2:] or list(HEADLINE)
    spark = get_spark(app_name="plan-dump")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            plan = f"PLAN ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Three-decade scaling probe: time chosen registry queries at sf0.1,
sf1 (10 tiles) and sf10 (100 tiles) and print per-decade exponents.

The per-round bench fits exponents over sf0.01 -> sf0.1 -> sf1; the
bottom decade is overhead-dominated, so a genuinely superlinear tail can
hide behind a healthy-looking average. This probe adds the decade ABOVE
the bench's range (sf1 -> sf10, ~1.5 GB of parquet) for the
pair-generating family, where the worry is real. Not part of the
per-round bench (the sf10 build + runs cost ~10 min); run by hand:

    python tools/scaling_probe.py [query ...]

defaults to the pair-generating family. Prints one JSON line:
{query: {"sf0.1": s, "sf1": s, "sf10": s, "e_01_1": e, "e_1_10": e}}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["dedup_jaccard_prefix", "text_tfidf_cosine_pairs", "sim_knn_graph"]


def main() -> None:
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY
    from real_value_etl_spark.session import get_spark
    from tools.make_sf1 import ensure_sf1, ensure_sf10

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling-probe")
    dirs = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": ensure_sf1(),
        "sf10": ensure_sf10(),
    }
    out: dict[str, dict[str, float]] = {}
    for name in names:
        spec = REGISTRY[name]
        row: dict[str, float] = {}
        for label, d in dirs.items():
            spark.catalog.clearCache()
            spec.fn(spark, d).count()  # warm (JIT + AQE sizes)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            spec.fn(spark, d).count()
            row[label] = round(time.perf_counter() - t0, 3)
            print(f"# {name} {label}: {row[label]:.3f}s", file=sys.stderr)
        row["e_01_1"] = round(math.log10(row["sf1"] / row["sf0.1"]), 3)
        row["e_1_10"] = round(math.log10(row["sf10"] / row["sf1"]), 3)
        out[name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()

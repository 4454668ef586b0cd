"""Import every query module so REGISTRY is fully populated, then order it.

Imports are deliberately LOUD: a missing query module must fail collection,
not be silently swallowed (a round-1 try/except hid a dead import for a
module that never existed).

The driver's correctness harness emits rows for the FIRST 50 registry
entries only (verified round 1: CORRECTNESS_r01.json keys ==
list(REGISTRY)[:50]). `DRIVER_WINDOW` therefore curates those 50 slots as
one-per-family representatives spanning every SURVEY.md §2 section —
events, streaming, ETL scalar/array surface, TPC-H subquery shapes, stats,
LLM ops, graph, connectors — and rotates per round so every query
eventually gets a driver-verified row. Queries beyond the window stay
registered (and locally gated by tests/test_oracle_parity.py, which runs
ALL of them).
"""

from . import (  # noqa: F401
    corpus_quality,
    events_queries,
    feature_ops,
    graph,
    incremental,
    llm,
    llm_mix,
    relational,
    retrieval_graph,
    stats,
    streaming_queries,
    subqueries,
    tokenizer,
    tpch_more,
    tpch_rest,
)
from .registry import REGISTRY

# Round-7 window (VERDICT r6 ask #1: evidence freshness). Two re-confirm
# slots lead: `graph_label_propagation`'s plan changed in r6 (tree-router
# assignment) AFTER the r6 window was cut, so its newest driver row (r5)
# predates the executed plan; `sim_knn_graph` gets the adaptive-router
# change THIS round (r6 asks #2/#6). The remaining 48 slots are the
# oldest-evidence cohort, computed mechanically from CORRECTNESS_r01..r06
# latest-green rows: all 38 queries whose newest green row is r2, then
# the first 10 (alphabetical) of the 48-query r3 cohort. Post-window
# histogram: no query's newest driver evidence predates r3.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- re-confirm: executed plans changed after their last driver row
    "graph_label_propagation",
    "sim_knn_graph",
    # -- r2-latest cohort (all 38)
    "docs_decontaminate",
    "events_cdc_apply",
    "events_cohort_retention",
    "events_ewma_by_user",
    "events_funnel",
    "events_gapfill_hourly",
    "events_incremental_mv",
    "events_interval_join",
    "events_json_extract",
    "events_sessionize",
    "events_trailing_1h",
    "events_tumbling_agg",
    "events_upsert_scd1",
    "events_via_duckdb_source",
    "profile_lineitem",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q_corr_qty_price",
    "q_histogram_totalprice",
    "q_pivot_status",
    "q_stats_quantity",
    "stream_dedup_keys",
    "stream_dedup_watermark",
    "stream_incremental_mv",
    "stream_session_window",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_tumbling_agg",
    "stream_user_totals",
    # -- r3-latest cohort (first 10 of 48; remainder rotates in r8)
    "docs_boilerplate_strip",
    "docs_by_lang_source",
    "docs_dedup_savings",
    "docs_header_strip",
    "docs_length_balanced_buckets",
    "docs_mix_temperature",
    "docs_ngram_novelty",
    "docs_quality_funnel",
    "docs_quality_lr_score",
    "docs_repeated_spans",
)


def _apply_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise ImportError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()

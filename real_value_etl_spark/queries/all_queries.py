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

# Round-8 window (VERDICT r7 ask #1: evidence freshness). The 23 round-7
# additions have NEVER appeared in any CORRECTNESS_r*.json — they lead and
# take priority (this is also the re-confirm set: `dedup_bcubed_eval`'s
# quantization moves to DECIMAL(38,0) and `docs_greedy_coverage`'s per-step
# filter moves to an anti-join THIS round, so their first driver rows land
# on the changed plans). The remaining 27 slots are the oldest-evidence
# cohort, computed mechanically from CORRECTNESS_r01..r07 latest-green
# rows: the first 27 (alphabetical) of the 38-query r3 cohort. The 11
# overflow r3 stragglers (q9_product_profit .. text_collocations) rotate
# into r9. Post-window histogram target: {r3: 11, r4: 28, ...}.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- the 23 round-7 queries with zero driver evidence (never windowed)
    "dedup_bcubed_eval",
    "dedup_semdedup",
    "docs_dsir_select",
    "docs_greedy_coverage",
    "events_acf_hourly",
    "events_fano_burstiness",
    "events_interval_union",
    "events_longest_streak",
    "events_xcorr_click_purchase",
    "graph_hits_lineitem",
    "graph_ppr_seeds",
    "multimodal_jpeg_sof_parse",
    "multimodal_pcm_frame_energy",
    "multimodal_tiff_exif_parse",
    "q_cube_hll_users",
    "q_gini_revenue",
    "q_priority_sample_sum",
    "q_skyline_parts",
    "q_weighted_median",
    "sim_rrf_fusion",
    "stream_hll_distinct",
    "text_hll_registers",
    "text_kneser_ney_score",
    # -- r3-latest cohort (first 27 of 38; 11 stragglers rotate in r9)
    "docs_source_divergence",
    "docs_source_resample",
    "emb_gram_matrix",
    "emb_label_centroids",
    "events_anomaly_hours",
    "events_attribution",
    "events_gapfill_interp",
    "events_outliers_mad",
    "events_quality_audit",
    "events_rate_limit",
    "events_running_total",
    "events_scd2_history",
    "events_session_window",
    "events_sliding_agg",
    "events_via_jsonl_source",
    "lang_confusion",
    "lang_vocab_overlap",
    "lineitem_via_partitioned_source",
    "multimodal_dedup",
    "orders_via_orc_source",
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_share",
    "q16_parts_suppliers",
    "q19_discounted_revenue",
    "q20_excess_suppliers",
    "q8_market_share",
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

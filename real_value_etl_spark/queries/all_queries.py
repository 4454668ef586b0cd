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

# Round-5 window (VERDICT r4 ask #1): the 25 queries that have never had
# a driver CORRECTNESS row — exactly the round-4 additions (computed
# mechanically as registry − keys(CORRECTNESS_r01∪r02∪r03∪r04)) — rotate
# IN. The 25 spare slots re-confirm, per the verdict's guidance: the
# rewritten NTILE query `q_rfm_segments` (its plan changed this round —
# VERDICT r4 ask #2; `q_cumulative_gains`, the other rewrite, is among
# the 25), the heaviest previously-green headliners, and the r2 fixes.
# With all green, cumulative driver-green reaches 207/207 (one of which,
# `q_approx_stats`, is rows-only by construction).
DRIVER_WINDOW: tuple[str, ...] = (
    # -- never-driver-verified: the 25 round-4 additions
    "asof_next_click",
    "customer_via_csv_source",
    "docs_quality_calibration",
    "docs_span_pair_dedup",
    "docs_udtf_token_spans",
    "emb_power_iteration",
    "emb_random_projection",
    "events_ab_test_zscore",
    "events_late_arrival_audit",
    "events_scd2_pointintime",
    "events_seasonal_baseline",
    "graph_bfs_distance",
    "graph_components_star",
    "lang_id_auc",
    "multimodal_wav_header_parse",
    "q_cumulative_gains",
    "q_null_semantics",
    "q_percentile_disc",
    "q_salted_hot_key_agg",
    "q_try_arithmetic",
    "sim_nprobe_recall_curve",
    "sim_silhouette",
    "stream_kmv_distinct",
    "text_kmv_jaccard",
    "text_tokenizer_fertility",
    # -- re-confirm: plan rewritten this round (two-phase global_ntile)
    "q_rfm_segments",
    # -- re-confirm: heaviest previously-green headliners
    "text_tfidf_cosine_pairs",
    "sim_ivf_pq_topk",
    "graph_pagerank_lineitem",
    "text_bpe_train",
    "dedup_jaccard_prefix",
    "sim_knn_graph",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_kmeans_train",
    "graph_label_propagation",
    "graph_triangle_count",
    "orders_market_basket",
    "stream_holt_forecast",
    "events_k_anonymity",
    "dedup_exact_docs",
    "events_dedup_keepfirst",
    "fuzzy_match_customers",
    "multimodal_decode",
    "etl_scalar_funcs",
    "etl_array_funcs",
    # -- re-confirm: the four r2 fixes
    "docs_pretraining_mix",
    "text_postings",
    "docs_pack_sequences",
    "sim_embedding_topk",
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

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

# Round-4 window (VERDICT r3 ask #1): the 37 queries that have never had a
# driver CORRECTNESS row — exactly the round-3 additions (computed
# mechanically as registry − keys(CORRECTNESS_r01∪r02∪r03)) — rotate IN.
# Slot 38 is `q_approx_stats`, the one registry entry with zero usable
# driver evidence (its r3 row errored on an array<double> column; the
# query now returns scalar p50/p95/p99 — VERDICT ask #2). The remaining
# 12 slots re-confirm the heaviest previously-green rows and the four r2
# fixes, per the verdict's spare-slot guidance. With all green, cumulative
# driver-green reaches 182/182.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- never-driver-verified: corpus mix / export (late r3)
    "docs_tokenize_ids",
    "docs_shuffle_shards",
    "docs_token_budget_sample",
    "docs_ccnet_buckets",
    "docs_vocab_growth",
    "docs_winsorize",
    "docs_incremental_dedup",
    "docs_containment",
    "docs_leakage_safe_split",
    "lang_id_kappa",
    # -- never-driver-verified: events analytics (late r3)
    "events_holt_linear",
    "events_top_paths",
    "events_transition_matrix",
    "events_rolling_active_users",
    "events_anomaly_transitions",
    "events_churn_by_cohort",
    "events_k_anonymity",
    "events_via_snapshot_table",
    # -- never-driver-verified: similarity / PQ / graph (late r3)
    "sim_pq_encode",
    "sim_pq_adc_recall",
    "sim_ivf_pq_topk",
    "sim_knn_graph",
    "graph_label_propagation",
    "graph_triangle_count",
    # -- never-driver-verified: text / sketches / multimodal (late r3)
    "text_kmv_distinct",
    "text_countmin_freq",
    "text_tfidf_cosine_pairs",
    "text_bpe_train",
    "multimodal_header_parse",
    "multimodal_phash_dedup",
    # -- never-driver-verified: relational diagnostics / sources (late r3)
    "q_rfm_segments",
    "q_rollup_share_of_parent",
    "q_join_size_estimate",
    "q_key_skew_report",
    "orders_market_basket",
    "docs_via_evolved_parquet",
    # -- never-driver-verified: streaming (late r3)
    "stream_holt_forecast",
    # -- zero usable driver evidence: r3 row errored (array column);
    #    contract fixed this round to scalar p50/p95/p99
    "q_approx_stats",
    # -- re-confirm: heaviest previously-green headliners
    "dedup_jaccard_prefix",
    "graph_pagerank_lineitem",
    "sim_kmeans_train",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "etl_scalar_funcs",
    "etl_array_funcs",
    "multimodal_decode",
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

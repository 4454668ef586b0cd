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

# Round-13 window (driver round 12). Composition per VERDICT r11 asks #1
# and #5: (a) the 5 never-driver-checked r11 additions; (b) the 5
# evidence RESETS — queries whose semantics changed after their last
# green row (multimodal_decode: stub -> real PNG loop in r11;
# multimodal_resize / multimodal_features / multimodal_phash_dedup: stub
# kernels -> real pixel kernels this round; docs_quality_funnel: robots
# gate added as stage 1 this round); (c) the round-12 additions
# multimodal_inflate_dynamic_huffman + multimodal_png_decode_real +
# multimodal_gzip_inflate + multimodal_zip_extract +
# multimodal_warc_gzip_extract + multimodal_tfrecord_walk +
# multimodal_sqlite_table_scan + multimodal_avro_container_walk +
# events_pattern_match + stream_pattern_match;
# (d) 30 oldest-evidence re-probes — rows whose only green is from round
# 5, six rounds of shared-infrastructure drift ago (additions take
# slots before re-probes, so the alphabetically-last r5 rows —
# q_percentile_disc, q_salted_hot_key_agg, q_try_arithmetic,
# sim_embedding_topk, sim_kmeans_train, sim_nprobe_recall_curve,
# sim_silhouette, stream_holt_forecast, text_bpe_train and the four
# text_* — defer to the r13 rotation, noted in COVERAGE.md).
# 5 + 5 + 10 + 30 = 50 exactly.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- (a) never-driver-checked r11 additions
    "docs_domain_caps",
    "docs_robots_filter",
    "docs_url_dedup",
    "multimodal_png_decode_gray",
    "multimodal_warc_record_walk",
    # -- (b) evidence resets (semantics changed since last green)
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_features",
    "multimodal_phash_dedup",
    "docs_quality_funnel",
    # -- (c) round-12 additions
    "multimodal_inflate_dynamic_huffman",
    "multimodal_png_decode_real",
    "multimodal_gzip_inflate",
    "multimodal_zip_extract",
    "multimodal_warc_gzip_extract",
    "multimodal_tfrecord_walk",
    "multimodal_sqlite_table_scan",
    "multimodal_avro_container_walk",
    "events_pattern_match",
    "stream_pattern_match",
    # -- (d) oldest-evidence re-probes (every green is r5; sorted)
    "asof_next_click",
    "customer_via_csv_source",
    "dedup_exact_docs",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "docs_pack_sequences",
    "docs_pretraining_mix",
    "docs_quality_calibration",
    "docs_span_pair_dedup",
    "docs_udtf_token_spans",
    "emb_power_iteration",
    "emb_random_projection",
    "etl_array_funcs",
    "etl_scalar_funcs",
    "events_ab_test_zscore",
    "events_dedup_keepfirst",
    "events_k_anonymity",
    "events_late_arrival_audit",
    "events_scd2_pointintime",
    "events_seasonal_baseline",
    "fuzzy_match_customers",
    "graph_bfs_distance",
    "graph_components_star",
    "graph_pagerank_lineitem",
    "graph_triangle_count",
    "lang_id_auc",
    "multimodal_wav_header_parse",
    "orders_market_basket",
    "q_null_semantics",
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

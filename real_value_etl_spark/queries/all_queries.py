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

# Round-12 window (driver round 11). Mechanical composition from the
# CORRECTNESS_r01..r10 union: after r10 landed (49 green + q_approx_stats
# rows-only), exactly 49 registry entries had never appeared in ANY driver
# window — the full classical-inference kit (16 q_* stats tests), the
# survival/time-series events ops (11), 10 container codecs, the graph
# four + sim_kcenter_seeds, stream_ams_f2/stream_moments, and the three
# heavy text ops. VERDICT r10 ask #1: book all 49 this round; the 50th
# slot re-probes q_hdr_histogram_price on driver record after its r10
# shiftleft BIGINT fix (VERDICT r10 suggestion). 49 + 1 = 50 exactly —
# cumulative driver coverage becomes 339/339 + 1 re-green when this
# window lands.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- the 49 never-driver-checked entries (sorted)
    "docs_rouge2_pairs",
    "docs_tv_distance",
    "events_cochran_q",
    "events_friedman_test",
    "events_granger_lag1",
    "events_hurst_rs",
    "events_interevent_burstiness",
    "events_kaplan_meier",
    "events_kendall_tau",
    "events_ljung_box",
    "events_logrank_test",
    "events_ordinal_patterns",
    "events_theil_sen",
    "graph_bipartite_squares",
    "graph_double_sweep",
    "graph_edge_jaccard",
    "graph_katz_centrality",
    "multimodal_avi_idx1_walk",
    "multimodal_bson_doc_walk",
    "multimodal_ebml_vint_walk",
    "multimodal_elf_section_walk",
    "multimodal_gif_frame_walk",
    "multimodal_gzip_member_parse",
    "multimodal_ico_parse",
    "multimodal_midi_track_walk",
    "multimodal_png_crc32",
    "multimodal_webp_vp8l_parse",
    "q_anova_oneway",
    "q_cliffs_delta",
    "q_cramer_von_mises",
    "q_cramers_v",
    "q_extreme_studentized",
    "q_jarque_bera",
    "q_jonckheere_terpstra",
    "q_kruskal_wallis",
    "q_ks_two_sample",
    "q_levene_test",
    "q_mann_whitney",
    "q_mcnemar",
    "q_ols_price_on_qty",
    "q_permutation_test",
    "q_spearman_rho",
    "q_welch_t_test",
    "sim_kcenter_seeds",
    "stream_ams_f2",
    "stream_moments",
    "text_burrows_delta",
    "text_suffix_lcp_dedup",
    "text_yule_k",
    # -- re-green the r10 shiftleft fix on driver record
    "q_hdr_histogram_price",
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

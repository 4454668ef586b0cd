"""Registry-wide physical-plan gate (VERDICT r5 ask #1).

One sweep over EVERY registered query's executed plan asserting the
scale invariants that previous rounds audited by hand:

(a) any `Exchange SinglePartition` sits over a bounded-by-construction
    frame — scalar aggregates (one partial row per upstream partition),
    the two-phase rank family's n_partitions-row `__pid` frames,
    limit-bounded frames, and two known small frames waived per-query;
(b) no Python evaluation (`BatchEvalPython` / `ArrowEvalPython` /
    UDTF) outside the sanctioned kernel list — row-at-a-time Python in
    a hot path is the 10-100x slow path;
(c) Arrow kernels (`MapInPandas` / `FlatMapGroupsInPandas[WithState]`)
    only in the queries whose operators are deliberately Arrow-batched
    (multimodal codecs, Misra-Gries merge, first-fit packing, matmul);
(d) no `CartesianProduct` anywhere, and `BroadcastNestedLoopJoin` only
    with an explicit per-query waiver documenting why the build side is
    bounded (broadcast of a fixed-size query/codebook/spine/scalar
    frame — the data side streams once, which survives any scale).

Every waiver is inline below with its justification; a new query that
trips a rule fails this test until it is either re-planned or waived
with a reason.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from real_value_etl_spark.operators import scan
from real_value_etl_spark.queries.all_queries import REGISTRY

# ---------------------------------------------------------------------------
# (a) Exchange SinglePartition: structurally bounded child frames
# ---------------------------------------------------------------------------

_BOUNDED_SINGLE_PARTITION = (
    # final stage of a scalar/global aggregate: the exchange input is ONE
    # partial row per upstream partition, regardless of data size
    re.compile(r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys?=\[\]"),
    # the two-phase rank family's per-partition count/total frame —
    # n_partitions rows by construction (operators/scan.py)
    re.compile(r"keys?=\[__pid"),
    # a LocalLimit above the exchange bounds the rows entering it
    re.compile(r"LocalLimit \d+"),
)

# per-query waivers for SinglePartition children that are bounded by the
# query's own semantics rather than by plan structure
_SINGLE_PARTITION_WAIVERS: dict[str, re.Pattern] = {
    # AUC over a score column with <= 7 distinct calibrated scores
    # (queries/corpus_quality.py) — the frame is the distinct-score set
    "lang_id_auc": re.compile(r"keys=\[score"),
    # ten-row decile frame (queries/relational.py, q_cumulative_gains)
    "q_cumulative_gains": re.compile(r"decile_rev"),
    # 3-row per-returnflag totals frame feeding the group-offset window
    # (queries/stats.py q_weighted_median — bounded by flag cardinality)
    "q_weighted_median": re.compile(r"keys=\[l_returnflag"),
    # cumulative count over the bounded HDR cell frame (<= 64 * 4 cells
    # by construction: bit-length x sub-bucket, queries/stats.py)
    "q_hdr_histogram_price": re.compile(r"min_cents|\bsub\b"),
    # skyline phase 2: the global window sees only phase-1 survivors —
    # per-partition Pareto frontiers, each already running-min-filtered
    # (queries/stats.py q_skyline_parts; frontier << n by construction)
    "q_skyline_parts": re.compile(r"p_retailprice.*p_size"),
    # Kaplan-Meier / log-rank risk-set windows run over the DURATION
    # spine — <= KM_WINDOW_H + 1 distinct hours by construction
    # (events_queries.py), wall-clock-bounded, never data-sized
    "events_kaplan_meier": re.compile(r"n_subj"),
    "events_logrank_test": re.compile(r"\bout1\b|\bnn1\b"),
}

# ---------------------------------------------------------------------------
# (b)+(c) Python/Arrow evaluation: sanctioned kernels only
# ---------------------------------------------------------------------------

_PY_EVAL = re.compile(r"BatchEvalPython|ArrowEvalPython|PythonUDTF")
_ARROW_KERNEL = re.compile(r"MapInPandas|FlatMapGroupsInPandas")

# the UDTF-surface query exists to demonstrate the lateral-UDTF API
# (SURVEY §2.10); Spark plans UDTFs as BatchEvalPythonUDTF by design
_PY_EVAL_WAIVERS = {"docs_udtf_token_spans"}

# queries whose operators are deliberately Arrow-batched `mapInPandas` /
# `applyInPandas` kernels (operators/multimodal.py, heavyhitters.py,
# packing.py, feature_ops matmul) — vectorized batch transfer, never
# row-at-a-time
_ARROW_KERNEL_WAIVERS = {
    "emb_gram_matrix",
    "emb_pca_deflation",
    "emb_power_iteration",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_inflate_dynamic_huffman",
    "multimodal_png_decode_real",
    "multimodal_phash_dedup",
    "multimodal_resize",
    "text_heavy_hitters",
    "docs_pack_sequences",
}

# ---------------------------------------------------------------------------
# (d) BroadcastNestedLoopJoin waivers: why each build side is bounded
# ---------------------------------------------------------------------------

_R_QUERYSET = (
    "non-equi (id != qid) join of the corpus against a BROADCAST query/"
    "centroid/codebook set that is fixed-size by construction "
    "(ANN_SEED_CAP / k / PQ codebook) — corpus side streams once"
)
_R_SCALAR = (
    "cross join against a one-row scalar frame (count / total / "
    "percentile / avg-balance subquery result) broadcast to all tasks"
)
_R_SPINE = (
    "cross product with a bounded calendar/category spine (hour grid, "
    "distinct event types, cohort months) — spine is O(1) in data size"
)
_R_PAIRS = (
    "pairwise comparison over a bounded entity set (sources <= 5, "
    "query terms, top-N items) — both sides capped frames"
)

_BNLJ_WAIVERS: dict[str, str] = {
    # vector / similarity family — broadcast bounded query or codebook
    "dedup_embedding_cosine": _R_QUERYSET,
    "dedup_semdedup": _R_QUERYSET,
    "dedup_lsh_recall": _R_QUERYSET,
    "emb_random_projection": "fixed 48-row projection basis broadcast",
    "sim_ann_ivf": _R_QUERYSET,
    "sim_embedding_topk": _R_QUERYSET,
    "sim_hard_negatives": _R_QUERYSET,
    "sim_ivf_pq_topk": _R_QUERYSET,
    "sim_knn_graph": _R_QUERYSET,
    "sim_matryoshka_recall": _R_QUERYSET,
    "sim_mmr_rerank": _R_QUERYSET,
    "sim_ndcg_matryoshka": _R_QUERYSET,
    "sim_nprobe_recall_curve": _R_QUERYSET,
    "sim_pair_distance_hist": _R_QUERYSET,
    "sim_radius_search": _R_QUERYSET,
    "sim_ari_clusterings": _R_QUERYSET
    + "; plus two one-row C(.,2)-sum scalar frames cross-joined into "
    "the single-row index",
    "sim_pq_adc_recall": _R_QUERYSET,
    "sim_quantization_recall": _R_QUERYSET,
    "sim_rerank_quantized": _R_QUERYSET,
    "sim_rrf_fusion": _R_QUERYSET,
    # iterative graph — per-superstep scalar frames (node count,
    # dangling mass, convergence delta) broadcast into the update join
    "graph_hits_lineitem": _R_SCALAR
    + " (per-round MAX normalizer broadcast into the score projection)",
    "graph_label_propagation": _R_SCALAR,
    "graph_pagerank_lineitem": _R_SCALAR,
    "graph_ppr_seeds": _R_SCALAR
    + " (1-row seed count broadcast into the teleport term)",
    "graph_triangle_count": _R_SCALAR
    + "; plus the m>n orientation condition over broadcast edge sample",
    # time-spine / category cross products
    "events_acf_hourly": _R_SPINE
    + " (12-row lag spine x the bounded hourly-count series)",
    "events_xcorr_click_purchase": _R_SPINE
    + " (13-row lag spine x the bounded hourly-count series)",
    "events_churn_by_cohort": _R_SPINE,
    "events_gapfill_hourly": _R_SPINE,
    "events_gapfill_interp": _R_SPINE,
    "events_seasonal_baseline": _R_SPINE,
    "stream_hdr_quantile": _R_SPINE
    + " (3-row quantile spine x the |types|-row distinct-total frame — "
    "both bounded by construction; the histogram itself is sketch-sized)",
    # bounded pairwise comparisons
    "docs_mix_temperature": _R_PAIRS,
    "docs_source_divergence": _R_PAIRS,
    "docs_tv_distance": _R_SCALAR
    + " (1-row corpus token-count frame broadcast into the per-source "
    "deviation and the final ratio)",
    "lang_id_kappa": _R_PAIRS,
    "orders_market_basket": _R_PAIRS,
    "text_bm25_search": _R_PAIRS,
    "text_kneser_ney_score": _R_SCALAR
    + " (1-row bigram-type count broadcast into the scoring join)",
    "text_stupid_backoff": "probe frame = top-SB_TOP_BIGRAMS bigram "
    "contexts x top-SB_TOP_UNIGRAMS continuations (10 x 3 = 30 rows by "
    "construction, queries/llm.py SB_TOP_* constants); the corpus-sized "
    "tri/bi/uni count frames join the 30-row probe set with equi-keys "
    "only — this crossJoin never touches a corpus-sized side",
    "text_bpe_train": _R_PAIRS
    + " (merge-candidate frame vs one-row best-pair scalar)",
    "text_bpe_apply": _R_PAIRS
    + " (same trainer machinery: each merge rule is a broadcast one-row"
    " frame crossed into the word table; the extra final application"
    " adds one more such rule, never a data-sized side)",
    "text_collocations": _R_PAIRS,
    "text_keyword_extract": _R_PAIRS,
    "text_kmv_jaccard": _R_PAIRS,
    # scalar-subquery shapes
    "dedup_bcubed_eval": _R_SCALAR,
    "docs_domain_caps": _R_SCALAR
    + " (1-row corpus-total frame broadcast into the per-domain rank "
    "so the GREATEST(20, total/20) cap is computed without a collect)",
    "q_benford_audit": _R_SCALAR
    + " (9-digit spine x the 1-row total-order-count frame)",
    "q_hoover_index": _R_SCALAR
    + " (1-row (n, total) frame broadcast over the customer rollup, "
    "then two 1-row frames crossed for the final index)",
    "graph_katz_centrality": _R_QUERYSET
    + " (the shared kNN assignment's broadcast codebook routing)",
    "graph_double_sweep": _R_QUERYSET
    + " (kNN assignment codebook) plus three 1-row frames — the root/"
    "far seed picks and the two eccentricity reduces — crossed into "
    "the single summary row",
    "graph_modularity": _R_SCALAR
    + " (1-row mutual-edge-count frame m broadcast into the "
    "communities-sized rollup)",
    "events_friedman_test": _R_SPINE
    + " (day-grid x |types| block spine; plus the 1-row b/k/A4/ssq "
    "scalar frames crossed into the statistic)",
    "sim_kcenter_seeds": _R_SCALAR
    + " (each greedy step broadcasts ONE picked center row into the "
    "next distance map — K = 5 one-row frames by construction)",
    "graph_edge_jaccard": _R_QUERYSET
    + " (the shared kNN assignment's broadcast codebook routing)",
    "events_sliding_distinct_users": _R_SCALAR
    + " (1-row global max-hour bound broadcast into the window filter)",
    # crossJoins of three one-row frames: counts + exact join size + the
    # min-over-depths sketch estimate (queries/retrieval_graph.py)
    "q_join_size_cm_sketch": _R_SCALAR
    + " (two 1-row scalar aggregates cross-joined for the final ratios)",
    "q22_dormant_customers": _R_SCALAR,
    "q_equidepth_price": _R_SCALAR,
    "q_hll_set_ops": _R_PAIRS
    + " (event-type pairs: both sides are the |types|-row register "
    "summary frame, sketch-sized by construction)",
    "q_join_size_estimate": _R_SCALAR,
    "q_ks_two_sample": _R_SCALAR
    + " (1-row (n1, n2) totals frame broadcast into the per-value "
    "ECDF deviation)",
    "q_cramers_v": _R_PAIRS
    + " (level-spine cross: |priorities| x |statuses| <= 15 cells; plus "
    "three 1-row scalar frames crossed into the single-row summary)",
    "q_priority_sample_sum": _R_SCALAR
    + " (1-row tau / exact-total frames cross-joined into the estimate)",
    "q_rollup_share_of_parent": _R_SCALAR,
    "text_burrows_delta": _R_SPINE
    + " (|sources| x top-F feature spine: both sides bounded — sources "
    "categorical, F a literal constant)",
    "q_cliffs_delta": _R_SCALAR
    + " (1-row lo-group grand total broadcast into the descending-"
    "cumulative identity lo_above = n2_all - inclusive)",
    "events_kaplan_meier": _R_SCALAR
    + " (1-row corpus-max-timestamp and subject-count frames broadcast "
    "into the censoring rule and the risk-set identity)",
    "events_logrank_test": _R_SCALAR
    + " (1-row corpus-max-timestamp and per-cohort-count frames "
    "broadcast into the censoring rule and the risk-set identity)",
    "events_cochran_q": _R_SCALAR
    + " (three 1-row frames — k, column-sum, row-sum — crossed into "
    "the single-row statistic; plus the 1-row k frame broadcast into "
    "the saturated-row filter)",
}


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# (e) shuffle budget (VERDICT r6 ask #4): every query's Exchange /
# BroadcastExchange node counts are pinned to tests/shuffle_budget.json.
# EQUALITY, not <=, on both counts: an extra shuffle is the regression
# class the r6 kNN router introduced deliberately (and the bench caught
# late); a disappearing one is also a plan change a human should see.
# Update deliberately via `python tools/make_shuffle_budget.py` and
# commit the diff.
# ---------------------------------------------------------------------------

_BUDGET_PATH = os.path.join(os.path.dirname(__file__), "shuffle_budget.json")
try:
    with open(_BUDGET_PATH) as _f:
        _SHUFFLE_BUDGET = json.load(_f)["budgets"]
except FileNotFoundError:  # pre-generation bootstrap only
    _SHUFFLE_BUDGET = {}

_EXCHANGE_RE = re.compile(r"\bExchange ")  # word boundary: excludes
# Broadcast/ReusedExchange (no boundary mid-identifier)
_BROADCAST_RE = re.compile(r"\bBroadcastExchange\b")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_gate(spark, sf_dir, name):
    # Build each plan from a CLEAN cache state: CacheManager rewrites any
    # matching logical subtree to an InMemoryRelation, so a cache left by
    # an earlier query would change this query's plan shape (and its
    # exchange counts) depending on test order. The budget generator
    # (tools/make_shuffle_budget.py) clears identically.
    spark.catalog.clearCache()
    scan.release_rank_caches()
    plan = _executed_plan(REGISTRY[name].fn(spark, sf_dir))
    lines = plan.splitlines()

    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct"

    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            child = lines[i + 1] if i + 1 < len(lines) else ""
            ok = any(p.search(child) for p in _BOUNDED_SINGLE_PARTITION)
            waiver = _SINGLE_PARTITION_WAIVERS.get(name)
            ok = ok or (waiver is not None and waiver.search(child))
            assert ok, (
                f"{name}: Exchange SinglePartition over a non-bounded "
                f"frame:\n{child}"
            )

    if _PY_EVAL.search(plan):
        assert name in _PY_EVAL_WAIVERS, (
            f"{name}: un-sanctioned Python evaluation node "
            f"({_PY_EVAL.search(plan).group()})"
        )
    if _ARROW_KERNEL.search(plan):
        assert name in _ARROW_KERNEL_WAIVERS, (
            f"{name}: un-sanctioned Arrow kernel "
            f"({_ARROW_KERNEL.search(plan).group()})"
        )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_WAIVERS, (
            f"{name}: BroadcastNestedLoopJoin without a waiver — either "
            "re-plan as an equi/broadcast-hash join or add a waiver "
            "documenting why the build side is bounded"
        )

    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    budget = _SHUFFLE_BUDGET.get(sf_label, {}).get(name)
    # A registered query with NO pinned budget is a gate FAILURE, not a
    # skip: round 9 ended red because a final-commit query slipped in
    # unbudgeted and the silent skip hid it (VERDICT r9 ask #1).
    assert budget is not None, (
        f"{name}: no shuffle-budget entry for sf{sf_label} — run "
        "`python tools/make_shuffle_budget.py` (or tools/refresh_evidence.py) "
        "and commit tests/shuffle_budget.json"
    )
    got = {
        "exchange": len(_EXCHANGE_RE.findall(plan)),
        "broadcast": len(_BROADCAST_RE.findall(plan)),
    }
    assert got == budget, (
        f"{name}: exchange counts changed (got {got}, budget "
        f"{budget}) — if the plan change is deliberate, regenerate "
        "with `python tools/make_shuffle_budget.py` and commit"
    )

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
    "q17_small_quantity",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # round-2 additions: the two queries reworked for scale this round —
    # regressions in the similarity/jaccard family must show up in
    # BENCH_r{N} deltas, not only in plan reviews
    "dedup_jaccard_prefix",
    "sim_embedding_topk",
    "sim_ann_ivf",
    "text_quality_score",
    "events_tumbling_agg",
    "events_sessionize",
    "asof_purchase_login",
    # round-3 additions: the heaviest previously-unbenched families —
    # iterative graph + fixed-point kmeans, and the aggregation-shaped
    # corpus queries — so regressions in their plans show in BENCH deltas
    "graph_pagerank_lineitem",
    "sim_kmeans_train",
    "docs_boilerplate_strip",
    "docs_repeated_spans",
    "docs_ngram_novelty",
    "events_attribution",
    # round-3 late additions: the two heaviest new families — iterative
    # BPE merge learning and the truncated-dim retrieval eval (two full
    # brute-force top-k passes)
    "text_bpe_train",
    "sim_matryoshka_recall",
    # round-3 retrieval-graph/containment families: cluster-blocked kNN
    # graph with mutuality join, and asymmetric containment over LSH
    # candidates — new plan shapes, regressions must show in BENCH deltas
    "sim_knn_graph",
    "docs_containment",
    # the composed IVF-PQ retrieval path (probe + ADC LUT scoring) and the
    # df-bucketed sparse-cosine postings join
    "sim_ivf_pq_topk",
    "text_tfidf_cosine_pairs",
    # round-4: the last unbenched multi-stage family — Arrow pHash kernel
    # feeding a JVM banded self-join (VERDICT r3 ask #6)
    "multimodal_phash_dedup",
    # round-5 (VERDICT r4 ask #5): the two multi-stage round-4 additions —
    # O(log n) large-star/small-star connected components, and the
    # df-capped cross-doc span-pair dedup index
    "graph_components_star",
    "docs_span_pair_dedup",
]

# Scale rehearsal (VERDICT r4 ask #3): the heaviest headline families
# re-timed at a locally synthesized sf1 (10x sf0.1 — tools/make_sf1.py
# documents the tile transforms that keep candidate densities linear).
# One measured decade of scaling turns the 100 TB plan-shape arguments
# into an empirical exponent: ratio ~<= 12x means near-linear.
SF1_HEAVY = [
    "graph_pagerank_lineitem",
    "dedup_jaccard_prefix",
    "sim_ivf_pq_topk",
    "sim_knn_graph",
    "text_bpe_train",
    "text_tfidf_cosine_pairs",
    # the production dedup paths (exact digest + banded LSH) ride along so
    # the scale section shows them scaling linearly next to the exact
    # AllPairs path
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    # round-6 (VERDICT r5 ask #4): the previously un-rehearsed heavies —
    # the heaviest headline (O(log n) star CC), the df-capped span-pair
    # index, the Arrow pHash + banded-join path, and one streaming drain
    # (events are tiled 10x in the fixture as of make_sf1 v2, so the
    # stream row reflects a real 10x source)
    "graph_components_star",
    "docs_span_pair_dedup",
    "stream_kmv_distinct",
    # round-7 late additions: the two heaviest of the five new families —
    # HITS (6 shuffle-sums + per-round checkpoints over the distinct
    # supplier->part edges) and the B-cubed eval (rides the full jaccard
    # pair + CC machinery). Hand-probed sf0.1 -> sf1 before admission:
    # hits 3.17 -> 6.74 s (2.1x for 10x data — distinct edges grow
    # sublinearly), bcubed 5.21 -> 28.65 s (5.5x, the jaccard family's
    # usual shape); rrf/hll/jpeg stay out (1.5/0.5/0.9 s flat-to-linear).
    # hits third decade (hand probe, sf10 tiles): 34.9 s = 5.2x over sf1
    # -> e_1_10 ~ 0.71, sublinear through all three measured decades.
    "graph_hits_lineitem",
    "dedup_bcubed_eval",
    # round-8 (VERDICT r7 ask #5): the two textbook-scale-story plans that
    # had no measured decade — the one-pass HLL register cube (shuffle is
    # rows x 4 lattice cells x O(1) registers) and the two-phase skyline
    # (global pass sees only per-partition frontiers). Both are cheap;
    # their sf0.1 bases are measured inside bench_sf1 (non-HEADLINE path).
    "q_cube_hll_users",
    "q_skyline_parts",
    # round-9 admissions, hand-probed first (tools/r9_sf1_probe.py, quiet-
    # ratio protocol): sim_mmr_rerank 5.68 -> 12.13 s (2.14x for 10x
    # embeddings — the candidate brute scan is the only growing stage) and
    # stream_countmin 2.16 -> 4.30 s (1.99x for a real 10x event stream
    # through applyInPandasWithState). NOT admitted: graph_k_core — its
    # ratio measured 0.99 because the tiled fixture reuses the cust/supp
    # key universe, so the DISTINCT edge set saturates at 586,871 rows at
    # BOTH scales (verified by count); the fixture cannot exercise the
    # peel's growth, and a flat leg would overstate the evidence. The
    # codecs/burst/holt-winters/hll-setops/rep-coverage probes all read
    # 0.7-1.5x (map-only or bounded-series plans, fixed overhead
    # dominates) — recorded in COVERAGE.md, no leg needed.
    "sim_mmr_rerank",
    "stream_countmin",
    # round-10 admissions, hand-probed first (min-of-2, warm):
    # graph_k_truss 4.05 -> 5.93 s (1.47x for 10x embeddings — the
    # wedge/closing joins ride the mutual-kNN edge set, which grows
    # sublinearly under cluster-blocked assignment), stream_hdr_quantile
    # 2.52 -> 3.21 s (1.27x; stream-tagged => min-of-3 readings), and
    # sim_radius_search 1.30 -> 9.11 s (7.0x against a 10x work floor —
    # the broadcast-queries corpus scan IS the work; sublinear per unit).
    # NOT admitted: the two r10 codecs (2.5-3.0 s FLAT at both scales,
    # map-only with fixed overhead dominating) and STL/MAD (bounded
    # hourly series, 0.35-0.6 s flat) — recorded here, no leg needed.
    "graph_k_truss",
    "stream_hdr_quantile",
    "sim_radius_search",
    # round-10 late admission: graph_link_prediction 3.27 -> 7.25 s
    # (2.22x for 10x embeddings — the kNN-degree-bounded wedge grows with
    # the mutual edge set). NOT admitted from the same probe batch:
    # graph_local_clustering (1.94x, same wedge machinery as the two
    # admitted graph legs — one representative is enough),
    # events_sliding_distinct_users (1.16x: the tiled fixture reuses the
    # user universe so the (type, user, hour) pair table saturates — the
    # k_core fixture effect), q_bitmap_intersect / stream_bitmap_distinct
    # (0.6-0.9x: state bounded by the id DOMAIN, not the row count — flat
    # by design), events_chi2_uniform (flat, 24-cell reduce).
    "graph_link_prediction",
    # round-11 admissions, hand-probed first (tools/r11_sf1_probe.py,
    # min-of-2 warm, graph_components_star control 5.50x):
    # graph_degree_assortativity 2.56 -> 6.36 s (2.49x for 10x
    # embeddings — full-edge-list degree joins, the heaviest and most
    # distinct plan shape of the five new mutual-kNN consumers) and
    # docs_simpson_diversity 0.39 -> 1.81 s (4.62x — the (source,token)
    # count grows with the corpus; the steepest genuine growth of the
    # round). NOT admitted: graph_modularity / graph_resource_allocation
    # / graph_path_counts / graph_rich_club (1.70/2.12/2.07/2.10x — all
    # ride the same mutual-kNN edge build as the admitted legs; one new
    # representative is enough, the r10 local_clustering rule),
    # events_bootstrap_ci / events_runs_test (1.09/1.22x — bounded
    # hourly series), q_hoover_index / q_benford_audit /
    # multimodal_tar_header_parse / stream_minmax_witness
    # (0.80-1.10x flat — scalar reduces, 9-cell spine, map-only codec,
    # O(1)-state stream).
    "graph_degree_assortativity",
    "docs_simpson_diversity",
    # round-12 admissions, hand-probed first (tools/r12_sf1_probe.py,
    # min-of-2 warm, graph_components_star control 3.01x):
    # text_suffix_lcp_dedup 2.65 -> 21.88 s (8.25x for 10x docs — the
    # suffix table IS the corpus token count, the steepest genuine
    # growth in the suite and still sub-linear per unit) and
    # sim_kcenter_seeds 3.11 -> 8.23 s (2.65x for 10x embeddings — K
    # chained broadcast map passes, a plan shape no existing leg has).
    # NOT admitted: docs_tv_distance (3.51x — token-keyed aggregate +
    # join, the simpson_diversity machinery; one representative rule),
    # graph_katz_centrality / graph_edge_jaccard / graph_double_sweep
    # (1.92/2.93/1.43x — all ride the mutual-kNN edge build already
    # represented by assortativity/link_prediction), q_mann_whitney
    # (0.88x — the tiled fixture reuses the price domain so the
    # distinct-value spine SATURATES, the k_core fixture effect),
    # stream_moments (1.37x — O(1) state, stream legs covered),
    # q_ks_two_sample / q_welch_t_test (orders is UNSCALED in the
    # fixture — flat by construction), events_theil_sen / kendall_tau /
    # friedman (0.99-1.26x — wall-clock-bounded spines), the three
    # codecs (0.96-1.17x — map-only).
    "text_suffix_lcp_dedup",
    "sim_kcenter_seeds",
    # round-13 admissions, hand-probed first (tools/r13_sf1_probe.py,
    # min-of-2 warm, graph_components_star control 3.28x on a ~30%
    # noisier host — two full bench runs this session landed 66.3 /
    # 57.7 s headline totals, so ratios, not absolute seconds, carry
    # the round's signal): stream_ams_f2 4.50 -> 15.19 s (3.37x for
    # 10x events — the x16 AMS ingest fan-out is the one new plan
    # shape that grows with the stream) and graph_bipartite_squares
    # 4.42 -> 7.45 s (1.68x — the degree-capped wedge join, a
    # pair-generating shape no existing leg has). NOT admitted:
    # q_kruskal_wallis / q_cramer_von_mises / q_jonckheere_terpstra /
    # q_cliffs_delta-family (0.65-0.98x — orders UNSCALED in the
    # fixture, flat by construction), events_hurst_rs /
    # events_ordinal_patterns / events_cochran_q (1.14-1.49x —
    # wall-clock-bounded spines), q_spearman_rho (1.20x — the rank
    # maps grow but the scan dominates), text_yule_k /
    # text_burrows_delta / q_jarque_bera / q_ols_price_on_qty /
    # q_extreme_studentized (1.46-2.15x but 0.3-2 s absolute — token
    # and scalar passes, no new plan shape vs admitted legs), the
    # three codecs (0.81-1.05x — map-only).
    "stream_ams_f2",
    "graph_bipartite_squares",
    # round-14 admissions, hand-probed first (tools/r14_sf1_probe.py,
    # min-of-2 warm, graph_components_star control 3.49x — inside the
    # r9-r13 quiet band): docs_rouge2_pairs 6.69 -> 43.70 s (6.53x for
    # 10x docs — the LSH-candidate-scoped bigram-overlap pair join, the
    # r12 heavy VERDICT r10 ask #7 flagged as probe-less; sublinear per
    # unit, same family shape as the jaccard legs but with the
    # rebuilt corpus bigram frame) and multimodal_decode 1.80 ->
    # 14.82 s (8.24x against a 10x work floor — the real PNG
    # encode+inflate+defilter Python kernel; the ONLY Arrow-kernel
    # pure-map path whose per-doc Python work grows with the corpus,
    # so it pins Arrow-batch throughput where phash_dedup pins
    # kernel+join). NOT admitted from the same probe batch:
    # text_burrows_delta 1.89x (matches the r13 probe's 1.46-2.15x
    # non-admission — token aggs, 1.1 -> 2.0 s absolute, no new plan
    # shape), multimodal_png_decode_gray 2.20x (map-only JVM codec,
    # fixed overhead dominates — the standing codec rule),
    # docs_url_dedup 1.74x / docs_domain_caps 1.23x (normalize+agg
    # with a FIXED canonical-group count (doc_id % 50) — group size
    # grows, group count doesn't, so the agg output is constant).
    "docs_rouge2_pairs",
    "multimodal_decode",    # moved LAST in r12 (was mid-list): the real-pHash rework made this
    # leg emit 1.67M pair rows at sf1 (70.8x the corpus growth — the
    # hamming<=1 semantics on a 16-bit hash; see COVERAGE round-15
    # probe). Three executions (warm + 2 timed) of that output mid-
    # section measurably taxed every later leg in r18 (graph_k_truss
    # read 17.6/28.5 s vs a fresh-session 7.94 s; shared-pairs 29.7 s vs
    # 12.3 s) — the aged-JVM effect the scale-section restart exists to
    # prevent, reintroduced mid-section. Last position bounds the blast
    # radius to nothing.
    "multimodal_phash_dedup",
]


def bench_sf001(spark) -> dict[str, float] | None:
    """Third scale point (VERDICT r5 ask #5): time SF1_HEAVY at sf0.01 so
    the sf0.01 -> sf0.1 -> sf1 decades give TWO per-query scaling
    exponents. Two points can't separate N^0.8 from N log N + constant;
    with three, a decade ratio that GROWS across decades is the
    superlinear signature (at small N fixed per-job overhead dominates,
    so e(0.01->0.1) < e(0.1->1) <= ~1.08 is the healthy profile)."""
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return None
    from real_value_etl_spark.queries.registry import REGISTRY

    sf001 = "/root/testdata/sf0.01"
    out: dict[str, float] = {}
    for name in SF1_HEAVY:
        spec = REGISTRY[name]
        try:
            spark.catalog.clearCache()
            spec.fn(spark, sf001).count()  # warm (JIT + AQE sizes)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            spec.fn(spark, sf001).count()
            out[name] = round(time.perf_counter() - t0, 4)
        except Exception:
            continue
        print(f"# sf0.01 {name}: {out[name]:.3f}s", file=sys.stderr)
    return out


# THIRD-DECADE PROBE FINDINGS (r6, tools/scaling_probe.py at sf10 —
# 100 tiles, ~1.6 GB — run by hand, too slow for the per-round bench):
# - sim_knn_graph: e(sf1->sf10) measured 1.746 (56x for 10x) with the
#   TWO-level router — the corpus x coarse assignment stage is N x N/625,
#   the next quadratic term in the series, invisible at bench decades.
#   Fixed with the three-level ivf_assign_tree (super -> coarse -> fine,
#   hash-selected super seeds, LEFT-join degradation keeps driver scales
#   bit-identical): 571s -> 26.3s at sf10, exponent 1.746 -> 0.773.
# - dedup_jaccard_prefix: e(sf1->sf10) = 1.111 wall-clock, but the
#   prefix-filter CANDIDATE COUNT is exactly 10.0x for 10x data
#   (3,098,030 -> 30,980,300 pairs) — the algorithm is linear; the
#   overage is fixed-heap GC pressure at 100x data in one local JVM
#   (raising shuffle partitions hits GCLocker thrash, not speedup). On a
#   cluster, per-executor volume stays constant as executors scale out.
# - text_tfidf_cosine_pairs: e(sf1->sf10) = 0.593 — sublinear, healthy.
# - dedup_minhash_lsh: e(sf1->sf10) = 0.811 — the banded path stays
#   sublinear through the third decade.
# - graph_components_star: e(sf1->sf10) = 1.037 — exactly the N log N
#   profile the large-star/small-star O(log n)-superstep bound predicts
#   (10x data adds ~1-2 convergence rounds); algorithmic, expected, and
#   the log factor is the known floor for iterative CC.
# - docs_span_pair_dedup (highest bench-decade tail, 0.93): volumes
#   audited at sf0.1 vs sf1 — span index 235,704 -> 2,357,040, df-capped
#   postings 21,543 -> 215,430, pair rows 11,544 -> 115,440: all exactly
#   10.0x. The df cap bounds the join worst-case by construction; the
#   wall-clock tail is shuffle volume in one JVM, not candidate growth.
def decade_exponents(
    t001: dict[str, float] | None,
    t01: dict[str, float],
    sf1: dict | None,
) -> dict[str, dict[str, float]] | None:
    """Per-query decade exponents e = log10(t_next / t_prev) for the two
    measured decades. e <= 1 is sub-linear; a RISING e across decades is
    the superlinear red flag the three-point design exists to catch."""
    import math

    if not t001 or not isinstance(sf1, dict):
        return None
    out: dict[str, dict[str, float]] = {}
    for name, a in t001.items():
        sf1_row = sf1.get(name) or {}
        # sf0.1 base: headline timing, else the base bench_sf1 measured
        # itself for non-HEADLINE SF1_HEAVY entries (ADVICE r6)
        b = t01.get(name) or sf1_row.get("sf0.1_sec")
        c = sf1_row.get("sec")
        if not (a and b and c):
            continue
        out[name] = {
            "e_001_to_01": round(math.log10(b / a), 3),
            "e_01_to_1": round(math.log10(c / b), 3),
        }
    return out


def bench_sf1(
    spark,
    base_timings: dict[str, float],
    sf1_meds: dict[str, float] | None = None,
    retries: dict[str, dict] | None = None,
):
    """Run SF1_HEAVY at the synthesized sf1 fixture; returns
    {query: {"sec": t, "ratio": t / sf0.1-time}} or an error marker.
    Only meaningful when the main bench ran at the standard sf0.1.
    sf1_meds/retries enable the per-leg anomaly retry (VERDICT r11
    ask #2) against trailing quiet-artifact sf1 medians."""
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return None
    from real_value_etl_spark.queries.registry import REGISTRY

    try:
        from tools.make_sf1 import ensure_sf1

        sf1_dir = ensure_sf1()
    except Exception as exc:  # fixture build is best-effort
        return {"error": f"sf1 fixture unavailable: {exc!r}"[:300]}
    out = {}
    bases = dict(base_timings)  # local: the headline payload stays as-is

    def _timed_runs(fn, n: int) -> list[float]:
        """n timed executions, cache-cleared each; the MIN is the engine
        number (established protocol), the spread goes in the artifact.
        n > 1 only for stream-tagged entries: the r8 committed run read
        stream_kmv_distinct at 10.99 s where the driver run read 1.79 s —
        a one-shot availableNow drain folds whatever trigger/worker-pool
        hiccup the window had into a single reading, so a single reading
        is not evidence (VERDICT r8 ask #5)."""
        reads = []
        for _ in range(n):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            reads.append(round(time.perf_counter() - t0, 4))
        return reads

    for name in SF1_HEAVY:
        spec = REGISTRY[name]
        n_reads = 3 if "stream" in spec.tags else 1
        # base_reads exists ONLY when this loop measured the sf0.1 base
        # itself (name outside HEADLINE); key every consumer on that one
        # fact instead of the coincidentally-equivalent `name not in
        # base_timings` (r9 ADVICE: the two drifting apart would
        # attribute a stale reading to the wrong query)
        base_reads = None
        try:
            if name not in bases:
                # SF1_HEAVY entry outside HEADLINE (the streaming drain):
                # time its sf0.1 base here, same warm protocol
                spark.catalog.clearCache()
                spec.fn(spark, SF_DIR).count()
                base_reads = _timed_runs(
                    lambda: spec.fn(spark, SF_DIR).count(), n_reads
                )
                bases[name] = min(base_reads)
                print(
                    f"# sf0.1 base {name}: {bases[name]:.3f}s"
                    + (f" (readings {base_reads})" if n_reads > 1 else ""),
                    file=sys.stderr,
                )
            spark.catalog.clearCache()
            spec.fn(spark, sf1_dir).count()  # one warm pass (JIT + AQE sizes)
            reads = _timed_runs(
                lambda: spec.fn(spark, sf1_dir).count(), n_reads
            )
            sec = min(reads)
            if sf1_meds is not None and retries is not None:
                sec = _anomaly_retry(
                    name,
                    sec,
                    sf1_meds.get(name),
                    lambda: _timed_runs(
                        lambda: spec.fn(spark, sf1_dir).count(), 1
                    )[0],
                    retries,
                    "sf1",
                )
        except Exception as exc:
            out[name] = {"error": repr(exc)[:200]}
            continue
        base = bases.get(name)
        out[name] = {
            "sec": sec,
            "ratio_vs_sf0.1": round(sec / base, 2) if base else None,
        }
        if n_reads > 1:
            out[name]["readings"] = reads
            if base_reads is not None:
                out[name]["sf0.1_readings"] = base_reads
        if base_reads is not None and base:
            # surface the locally-measured sf0.1 base (ADVICE r6): the
            # headline dict never sees it, and decade_exponents needs it
            # to emit the third-decade exponent for non-HEADLINE entries
            # (stream_kmv_distinct) instead of silently skipping them
            out[name]["sf0.1_sec"] = base
        print(f"# sf1 {name}: {sec:.3f}s", file=sys.stderr)
    return out


def bench_skew(spark):
    """Zipf-skew rehearsal (VERDICT r5 ask #7) on a 10x events table whose
    user_id is Zipf(1)-distributed — the heaviest user owns ~14% of ALL
    rows, the 100 TB hazard the uniform sf1 tiles can't show. Three
    probes, in decreasing order of what local wall-clock can prove:

    1. STRUCTURAL task-size metric for sessionize: rows landing on the
       heaviest task under the per-key window's hash(user_id) exchange vs
       under `sessionize_two_phase`'s range(user_id, ts) exchange. At
       100 TB the heaviest task IS the wall-clock; this metric transfers,
       wall-clock at 1M rows does not (measured below: the hot task is
       ~140k rows — a sort local[32] absorbs — so the two-phase's extra
       shuffle makes it SLOWER here; the crossover is when the hot key's
       volume exceeds one task's budget, which 14% of 100 TB always does).
    2. wall-clock A/B of the two sessionize plans (honest small-scale
       numbers, not the scale argument).
    3. AQE skew-join demo on a user_id-keyed SMJ (dimension enrich join —
       thresholds lowered to fire at fixture scale; production sizes trip
       the default 256 MB threshold unaided). Two findings baked into the
       probe's design, both verified live this round: (a) the dim side
       must be INDEPENDENT of the fact scan — when both join inputs
       descend from the same parquet scan (e.g. a self-derived per-user
       profile), Spark's OptimizeSkewedJoin declines to split and the
       hot partition survives; compute profiles as a separate source or
       broadcast them. (b) events_attribution rides along timed: its
       join key (user_id, session_seq) is the canonical key-refinement
       skew fix, but refinement only decomposes a hot user whose
       timeline has GAPS — this fixture's hot user is so dense the
       sessions merge into one giant session, and (measured) AQE's
       splitter is what saves the join. Defense in depth, not either/or.

    Runs LAST: it lowers AQE thresholds for probe 3 and restores them.
    """
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return None
    from pyspark.sql import functions as F

    from real_value_etl_spark.operators.sessionize import (
        sessionize,
        sessionize_two_phase,
    )
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY, table

    try:
        from tools.make_sf1 import ensure_sf1_skew

        skew_dir = ensure_sf1_skew()
    except Exception as exc:
        return {"error": f"skew fixture unavailable: {exc!r}"[:300]}

    out: dict[str, object] = {}

    def max_task_rows(df) -> int:
        return (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    ev = table(spark, skew_dir, "events")
    n_total = ev.count()
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out["rows"] = n_total
    out["max_task_rows_keyhash"] = max_task_rows(
        ev.repartition(n_part, "user_id")
    )
    out["max_task_rows_range"] = max_task_rows(
        ev.repartitionByRange(n_part, "user_id", "ts")
    )
    print(
        f"# skew structural: heaviest task {out['max_task_rows_keyhash']} rows "
        f"(hash(user_id), {100.0*out['max_task_rows_keyhash']/n_total:.1f}% of all) "
        f"vs {out['max_task_rows_range']} (range(user_id, ts), two-phase)",
        file=sys.stderr,
    )

    def _sess_agg(sess_df):
        return sess_df.groupBy("user_id", "session_seq").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    def _timed(fn):
        fn().count()  # warm (JIT + AQE sizes)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn().count()
        return round(time.perf_counter() - t0, 4), n

    naive_sec, naive_n = _timed(
        lambda: _sess_agg(sessionize(ev, "user_id", "ts", 1800))
    )
    two_sec, two_n = _timed(
        lambda: _sess_agg(sessionize_two_phase(ev, "user_id", "ts", 1800))
    )
    assert naive_n == two_n, "two-phase sessionize row count diverged"
    out["sessionize_keywide_window"] = naive_sec
    out["sessionize_two_phase"] = two_sec
    out["sessions"] = naive_n
    print(
        f"# skew sessionize: key-wide {naive_sec:.3f}s vs two-phase "
        f"{two_sec:.3f}s ({naive_n} sessions)",
        file=sys.stderr,
    )

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # fire AQE's splitter at fixture scale; disable broadcast so the
        # join actually sort-merges on the skewed key
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def _final_plan_exec(df):
            """Execute the frame's OWN QueryExecution (df.count() builds
            a different one, whose finalized plan the df never sees) and
            return (sec, final adaptive plan string)."""
            qe = df._jdf.queryExecution()
            qe.executedPlan().execute().count()  # warm, JVM-side action
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            qe2 = df._jdf.queryExecution()
            qe2.executedPlan().execute().count()
            return round(time.perf_counter() - t0, 4), qe2.executedPlan().toString()

        # probe 3a: user_id-keyed dim-enrich join — the hot user's
        # partition is ~10% of the fact side; AQE must split it. The dim
        # is INDEPENDENT of the fact scan on purpose (see docstring: a
        # profile derived from the same scan defeats OptimizeSkewedJoin).
        from pyspark.sql import functions as SF

        dim = spark.range(1, 1501).select(
            SF.col("id").alias("user_id"), (SF.col("id") * 7).alias("segment")
        )
        enrich = ev.join(dim, "user_id").select(
            "event_id", "user_id", "value", "segment"
        )
        out["enrich_join"], plan = _final_plan_exec(enrich)
        out["enrich_aqe_skew_split"] = "skew=true" in plan
        print(
            f"# skew enrich join: {out['enrich_join']:.3f}s "
            f"(AQE skew split: {out['enrich_aqe_skew_split']})",
            file=sys.stderr,
        )

        # probe 3b: events_attribution — (user_id, session_seq) key
        # refinement already decomposes the hot user; AQE finds nothing
        spark.catalog.clearCache()
        df = REGISTRY["events_attribution"].fn(spark, skew_dir)
        out["events_attribution"], plan = _final_plan_exec(df)
        out["attribution_aqe_skew_split"] = "skew=true" in plan
        print(
            f"# skew attribution: {out['events_attribution']:.3f}s "
            f"(AQE skew split: {out['attribution_aqe_skew_split']})",
            file=sys.stderr,
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return out


# The four registered queries that rebuild the identical Jaccard pair
# graph (threshold 0.5 over documents.text) — the shared_pair_cache()
# opt-in context pays the build once across them. Measured by
# tools/shared_pairs_probe.py at sf0.1 in r8: 22.5 s -> 10.9 s (52%).
PAIR_GRAPH_CONSUMERS = (
    "dedup_clusters",
    "graph_components_star",
    "dedup_bcubed_eval",
    "docs_leakage_safe_split",
)


def bench_shared_pairs(spark):
    """VERDICT r8 ask #6 + r9 ask #6: SHARED is the DEFAULT mode of this
    4-consumer suite leg (the r9 safety fixes — sameResult-confirmed
    hits, race/exit unpersists — made it promotable); the per-query
    rebuild total stays in the artifact as the comparison mode, and the
    persisted pair frame's measured memory cost is recorded. Per-query
    driver semantics are untouched: outside the context the consumers
    rebuild exactly as the driver measures them."""
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return None
    from real_value_etl_spark.operators.dedup import shared_pair_cache
    from real_value_etl_spark.queries.registry import REGISTRY

    def run_all() -> dict[str, float]:
        per: dict[str, float] = {}
        for name in PAIR_GRAPH_CONSUMERS:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).count()
            per[name] = round(time.perf_counter() - t0, 4)
        return per

    # same warm protocol as the headline loop: one unmeasured pass so JIT
    # and AQE sizing don't land in whichever mode runs first
    spark.catalog.clearCache()
    run_all()

    # DEFAULT mode first: one shared persisted pair graph for the suite.
    # Memory cost = the cached RDD footprint snapshotted while the
    # context is live (the price of the 2x win, documented per round).
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    with shared_pair_cache():
        shared = run_all()
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        shared_mem = int(sum(i.memSize() + i.diskSize() for i in infos))
    spark.catalog.clearCache()

    spark._jvm.System.gc()
    solo = run_all()
    spark.catalog.clearCache()

    out = {
        "default_mode": "shared",
        "shared": shared,
        "shared_total": round(sum(shared.values()), 4),
        "shared_mem_bytes": shared_mem,
        "per_query": solo,
        "per_query_total": round(sum(solo.values()), 4),
    }
    print(
        f"# shared-pairs (default): {out['shared_total']:.2f}s holding "
        f"{shared_mem / 1e6:.1f} MB vs per-query rebuild "
        f"{out['per_query_total']:.2f}s",
        file=sys.stderr,
    )
    return out


def _trailing_quiet_medians() -> tuple[dict[str, float], dict[str, float]]:
    """Per-leg medians across committed BENCH_LOCAL_r*.json artifacts not
    stamped noisy — the baseline for the per-leg anomaly retry (VERDICT
    r11 ask #2): r17 proved ONE start-of-run control can read quiet
    (-16.9%) while individual legs measured minutes later flap 2-4x (this
    host flaps on minute scales; the r14 forensics control triple read
    [0.57, 3.08, 1.05] s). Returns ({headline query: median sf0.1 sec},
    {sf1 leg: median sf1 sec})."""
    import glob
    import statistics

    here = os.path.dirname(os.path.abspath(__file__))
    head: dict[str, list[float]] = {}
    sf1: dict[str, list[float]] = {}
    for f in sorted(glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if d.get("noisy"):
            continue
        for q, v in (d.get("queries") or {}).items():
            if isinstance(v, (int, float)):
                head.setdefault(q, []).append(float(v))
        for q, row in (d.get("sf1") or {}).items():
            if isinstance(row, dict) and isinstance(
                row.get("sec"), (int, float)
            ):
                sf1.setdefault(q, []).append(float(row["sec"]))
    return (
        {q: statistics.median(v) for q, v in head.items()},
        {q: statistics.median(v) for q, v in sf1.items()},
    )


ANOMALY_FACTOR = 2.0  # leg > 2x its trailing quiet median => re-measure once


def _anomaly_retry(
    name: str,
    sec: float,
    med: float | None,
    rerun,
    retries: dict[str, dict],
    scale: str,
) -> float:
    """If a just-measured leg exceeds ANOMALY_FACTOR x its trailing quiet
    median, re-measure ONCE immediately and keep the MIN; both readings
    and the median land in the artifact so the flap is visible rather
    than silently absorbed (VERDICT r11 ask #2 / What's-wrong #1)."""
    if med is None or sec <= ANOMALY_FACTOR * med:
        return sec
    print(
        f"# {scale} {name}: {sec:.3f}s > {ANOMALY_FACTOR:.0f}x trailing "
        f"median {med:.3f}s — anomaly, re-measuring once",
        file=sys.stderr,
    )
    try:
        sec2 = rerun()
    except Exception:
        return sec
    retries[name] = {
        "scale": scale,
        "readings": [sec, sec2],
        "trailing_median": round(med, 4),
        "still_anomalous": min(sec, sec2) > ANOMALY_FACTOR * med,
    }
    return min(sec, sec2)


def _q1_control_read(spark, warms: int = 2) -> tuple[float, list[float]]:
    """The shared q1 control measurement (warm passes + min-of-3 timed,
    cache cleared each) used by the start / midpoint / end probes."""
    from real_value_etl_spark.queries.registry import REGISTRY

    spec = REGISTRY["q1_pricing_summary"]
    for _warm in range(warms):
        spark.catalog.clearCache()
        spec.fn(spark, SF_DIR).count()
    reads = []
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        reads.append(round(time.perf_counter() - t0, 4))
    return min(reads), reads


def control_recheck(spark, control: dict | None, stage: str) -> dict | None:
    """Midpoint / end control re-probe (VERDICT r11 ask #2): the start
    control certifies only the first minutes of a 45-minute run on a host
    that flaps on minute scales. Re-time q1 against the SAME trailing
    median and return a {sec, readings, deviation, noisy} row; a >25%
    deviation marks the artifact noisy_late so mid-run flaps can't hide
    behind a quiet start."""
    if control is None or "trailing_median" not in control:
        return None
    sec, reads = _q1_control_read(spark, warms=1)
    med = control["trailing_median"]
    row = {
        "sec": sec,
        "readings": reads,
        "deviation": round(sec / med - 1.0, 3),
    }
    row["noisy"] = row["deviation"] > 0.25
    print(
        f"# control q1 ({stage}): {sec:.3f}s vs trailing median "
        f"{med:.3f}s -> {row['deviation']:+.1%}"
        + ("  ** mid-run flap — artifact stamped noisy_late **"
           if row["noisy"] else ""),
        file=sys.stderr,
    )
    return row


def control_probe(spark) -> dict | None:
    """Host-contention guard (VERDICT r10 ask #2). The r10 committed
    artifact was recorded on a disclosed-noisy host (three identical-code
    runs spanned 57.7-75.1 s; its q1 control read 0.855 s vs a 0.53 s
    trailing median, +61%) and its sf1 decade exponents were refuted by
    quiet-host re-probes — a record that silently absorbs 2x environmental
    error will eventually hide a real 2x regression. So: BEFORE the suite,
    time the untouched q1 control (min-of-3, standard warm protocol) and
    compare to the median q1 across the committed BENCH_LOCAL_r*.json
    artifacts not themselves stamped noisy. Deviation > 25% stamps the
    payload {"noisy": true} so nobody reads absolute seconds from it;
    ratios within one run remain valid either way."""
    if not SF_DIR.rstrip("/").endswith("sf0.1"):
        return None
    import glob

    from real_value_etl_spark.queries.registry import REGISTRY

    spec = REGISTRY["q1_pricing_summary"]
    for _warm in range(2):
        spark.catalog.clearCache()
        spec.fn(spark, SF_DIR).count()
    reads = []
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        reads.append(round(time.perf_counter() - t0, 4))
    sec = min(reads)

    here = os.path.dirname(os.path.abspath(__file__))
    trailing = []
    for f in sorted(glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if d.get("noisy"):
            continue  # a contaminated record must not poison the baseline
        v = d.get("queries", {}).get("q1_pricing_summary")
        if v:
            trailing.append(float(v))
    out = {"query": "q1_pricing_summary", "sec": sec, "readings": reads}
    if trailing:
        trailing.sort()
        med = trailing[len(trailing) // 2] if len(trailing) % 2 else (
            trailing[len(trailing) // 2 - 1] + trailing[len(trailing) // 2]
        ) / 2
        out["trailing_median"] = round(med, 4)
        out["deviation"] = round(sec / med - 1.0, 3)
        out["noisy"] = out["deviation"] > 0.25
        if out["noisy"]:
            # VERDICT r10 ask #2's "retry later" arm: noisy neighbors on
            # this host come and go on minute scales (r13: three runs in
            # one session spanned 57.7-75.1 s) — wait one minute and
            # re-probe ONCE before accepting the stamp.
            print(
                f"# control q1: {sec:.3f}s vs trailing median {med:.3f}s "
                f"({out['deviation']:+.1%}) — noisy; retrying in 60 s",
                file=sys.stderr,
            )
            time.sleep(60)
            reads2 = []
            for _ in range(3):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                spec.fn(spark, SF_DIR).count()
                reads2.append(round(time.perf_counter() - t0, 4))
            sec2 = min(reads2)
            if sec2 < sec:
                out["sec"], out["readings"] = sec2, reads2
                out["deviation"] = round(sec2 / med - 1.0, 3)
                out["noisy"] = out["deviation"] > 0.25
            else:
                out["retry_readings"] = reads2
        print(
            f"# control q1: {out['sec']:.3f}s (readings {out['readings']}) "
            f"vs trailing median {med:.3f}s -> deviation "
            f"{out['deviation']:+.1%}"
            + ("  ** NOISY HOST — artifact will be stamped noisy:true **"
               if out["noisy"] else ""),
            file=sys.stderr,
        )
    else:
        out["noisy"] = False
    return out


ETL_ROWS_PER_PLATFORM = 50_000


def _etl_fixture_dir() -> str:
    """Generate (once, cached) scaled platform CSVs by cycling the test
    fixtures with unique ids/urls — the same data shape the reference's
    pandas pipeline processes, at 10x its 5k test-mode size."""
    import csv

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from tests.fixtures_etl import AVITO_ROWS, DOMCLICK_ROWS, YANDEX_ROWS

    base = f"/tmp/rve_etl_bench_{ETL_ROWS_PER_PLATFORM}"
    marker = os.path.join(base, ".done")
    if os.path.exists(marker):
        return base
    os.makedirs(base, exist_ok=True)
    specs = [
        ("domclick_20241214.csv", DOMCLICK_ROWS,
         lambda r, i: r.update({"Object ID": str(1_000_000 + i)})),
        ("yandex_20241208.csv", YANDEX_ROWS,
         lambda r, i: r.update({"url_offer_yand": f"//realty.yandex.ru/offer/{i}/"})),
        ("avito_20250319.csv", AVITO_ROWS,
         lambda r, i: r.update({"url_offer": f"https://avito.ru/kvartiry/{i}",
                                "id_offer": str(i)})),
    ]
    for fname, rows, mutate in specs:
        cols = list(rows[0].keys())
        with open(os.path.join(base, fname), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
            w.writeheader()
            for i in range(ETL_ROWS_PER_PLATFORM):
                r = dict(rows[i % len(rows)])
                mutate(r, i)
                w.writerow(r)
    open(marker, "w").close()
    return base


def bench_etl_pipeline(spark) -> tuple[float, int]:
    """Full 3-platform ETL (extract->transform->merge->cast->parquet).

    Since r3 the measured run gets the same codegen warm-up as every other
    headline query (one unmeasured full run first): the ETL plan is by far
    the largest generated-code surface in the suite, and its first
    execution is dominated by Janino+JIT compile, which made the reported
    number swing 6-15s with JVM state rather than engine changes. The
    honest COLD head-to-head against the reference's pandas pipeline
    (fresh JVM, zero warm-up: 14.3s vs pandas 15.9-23.5s on the identical
    150k-row fixture) is recorded in COVERAGE.md; what this bench tracks
    per-round is the steady-state engine time a recurring ETL pays."""
    import shutil

    from real_value_etl_spark.plans.pipeline import PipelineConfig, run_pipeline

    data_dir = _etl_fixture_dir()
    out = "/tmp/rve_etl_bench_out"
    request = {"domclick": "latest", "yandex": "latest", "cian": "skip",
               "avito": "latest"}
    for measured in (False, True):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        result = run_pipeline(
            spark, PipelineConfig(data_dir=data_dir, output_path=out),
            request=request,
        )
        elapsed = time.perf_counter() - t0
        assert result["status"] == "success", result
    n = spark.read.parquet(out).count()
    return elapsed, n


def main() -> None:
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY
    from real_value_etl_spark.session import get_spark

    spark = get_spark(app_name="rve-bench")
    # warm-up: JVM + parquet footers + page cache for every input table,
    # not measured — the bench reports engine time, not cold-I/O time
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    # codegen/JIT warm-up, PER QUERY, immediately before its timed run:
    # two unmeasured passes at the benchmark SF itself (AQE re-plans by
    # size, so sf0.001 compiles different code; the second pass is needed
    # because C2-tier JIT of the generated classes only kicks in after
    # the first execution — measured: heavy iterative queries run
    # 5.3s -> 2.6s -> 2.1s over three executions with caches cleared each
    # time). Warm-ups were GLOBAL passes through round 3 (all queries
    # twice, then all timed runs) — which silently un-warmed every query:
    # by a late query's timed run its generated classes had been cold for
    # ~30 other queries and the first-run JIT tax returned (measured on
    # pagerank: 3.5s warm-adjacent vs 5.9s after 19 intervening queries).
    # Interleaving makes the documented contract — steady-state engine
    # time for a RECURRING query, cold data caches — actually true;
    # BENCH_r04 is the first round measured this way, so cross-round
    # per-query deltas vs r03 include this methodology correction.
    # sim_ann_ivf +20% r3->r4 (1.59s -> 1.91s), investigated r5 per the
    # verdict ask: `git show` proves operators/similarity.py AND the
    # sim_ann_ivf query body are byte-identical between the r3 and r4
    # tags, so no engine change can be responsible. The delta is the r4
    # warm-up methodology itself: under r3's global-pass warm-up the
    # query sat warm-adjacent to its own family (sim_embedding_topk ran
    # immediately before it, sharing generated classes); per-query
    # interleaved warm-ups measure each query against cleared caches and
    # its OWN two warm passes only. At this query's size (~40 probe
    # queries x 2000 vectors) the measured 1.9s is dominated by fixed
    # per-job scheduler/codegen overhead across its multi-job plan, not
    # data — steady within +/-0.02s across r4/r5 runs, and the same
    # machinery's sf1 row scales 5.8x for 10x data (near-linear), which
    # is the number that matters at scale.
    # DRIFT VERDICT (r6, closing the r5 open question): BENCH_r05's
    # shared-33 total of 42.03s (+15.6% vs r4's 36.37s, uniform across
    # untouched queries) did NOT reproduce — two back-to-back quiet-window
    # runs this round measured 36.27s and 37.43s on the same shared-33,
    # i.e. r4-level, with no engine change that could explain a recovery
    # (the headline bodies are byte-identical r5->r6 except the three
    # NTILE queries' div rewrite, which timed the same). Conclusion: the
    # r5 number was environment (a contended driver window), not plans;
    # r6 numbers from the quiet window are the comparison base going
    # forward, and cross-round deltas should always be read against a
    # same-session re-run before being attributed to code. A FOURTH r6
    # run later the same day re-measured 42.02s (median per-query ratio
    # 1.10 vs the 36.95s run, spread p10 0.84 / p90 1.40, untouched
    # bodies) with zero local processes running — the host has
    # noisy-neighbor variance of up to ~±15%. Treat the MINIMUM across
    # runs as the engine number; single-run cross-round deltas under
    # ~20% are environment until reproduced.
    # r7 addendum: two full local runs this round landed at 48.3s and
    # 53.8s headline totals, inflated UNIFORMLY (+13-28%) across
    # byte-identical untouched queries (components_star 4.35->5.6/6.3,
    # tfidf 3.53->4.3/5.1, minhash 1.37->1.6/1.7) while the ONE query
    # whose plan changed this round — sim_knn_graph, adaptive router —
    # measured FASTER than its r6 base (1.96-2.47 vs 2.28). The host
    # window during r7's build was simply worse than the ±15% band;
    # if BENCH_r07's totals read high vs r6, check the untouched-query
    # ratios before attributing anything to code.
    # r8 addendum: the committed BENCH_LOCAL_r08.json run landed in a
    # near-quiet window — tfidf 3.50 / jaccard 2.51 / minhash 1.36 read
    # AT their r6 quiet bases (3.53/2.50/1.37) — confirming the r7
    # inflation was environment: every untouched family is back at
    # r6-level or better (pagerank 2.77 vs ~2.88; knn 1.895 vs the r6
    # 2.28 base, adaptive router). Earlier the same day the host showed
    # +17-48% on the components_star control, so same-day windows still
    # vary; min across runs remains the engine number.
    # The cache is CLEARED between every run including warm-ups: several
    # operators persist reused intermediates (jaccard prefix index,
    # pagerank edges, kmeans vectors), and CacheManager would otherwise
    # silently hand the timed run a warm copy — making those numbers
    # cache-reads, not engine time. Each timed query pays for its own
    # materializations.
    control = control_probe(spark)
    head_meds, sf1_meds = _trailing_quiet_medians()
    anomaly_retries: dict[str, dict] = {}

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        for _warm in range(2):
            if "stream" not in spec.tags:
                try:
                    spark.catalog.clearCache()
                    spec.fn(spark, SF_DIR).count()
                except Exception:
                    pass
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count() if "stream" not in spec.tags else -1
        sec = round(time.perf_counter() - t0, 4)

        def _rerun(spec=spec):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            d = spec.fn(spark, SF_DIR)
            d.count() if "stream" not in spec.tags else None
            return round(time.perf_counter() - t0, 4)

        timings[name] = _anomaly_retry(
            name, sec, head_meds.get(name), _rerun, anomaly_retries, "sf0.1"
        )
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    spark.catalog.clearCache()
    etl_sec, etl_rows = bench_etl_pipeline(spark)
    timings["etl_pipeline_150k"] = round(etl_sec, 4)
    print(
        f"# etl_pipeline_150k: {etl_sec:.3f}s "
        f"({etl_rows} rows out, {3 * ETL_ROWS_PER_PLATFORM / etl_sec:,.0f} rows/s in)",
        file=sys.stderr,
    )

    # midpoint control re-probe: the headline block is done, the scale
    # section hasn't started — catch a host that turned noisy mid-run
    control_mid = control_recheck(spark, control, "midpoint")

    # Fresh session for the SCALE section (round-11 finding): by the time
    # the sf1 legs run, the bench JVM has executed ~36 headline queries
    # plus the ETL, and its sf1 readings come out 1.5-2.5x ABOVE what the
    # same code measures in a fresh-JVM probe the same hour (r14/r15
    # artifacts: graph_components_star sf1 38.9/63.4 s vs the quiet probe's
    # 25.1 s; r10's refuted exponents fit the same pattern) — aged-heap /
    # GC-pressure tax, not host noise and not plans. Restarting the
    # SparkSession (same JVM process, fresh context: listener state and
    # block registry dropped, dead heap collectable) puts the scale legs
    # in probe-equivalent conditions so decade exponents are an honest
    # cross-round signal. Headline timings above are NOT affected (they
    # run first, in the order every prior round used).
    spark.stop()
    from real_value_etl_spark.session import get_spark as _gs

    spark = _gs(app_name="rve-bench-scale")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    sf1 = bench_sf1(spark, timings, sf1_meds=sf1_meds, retries=anomaly_retries)
    t001 = bench_sf001(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if sf1 is not None:
        payload["sf1"] = sf1
    if t001 is not None:
        payload["sf0.01"] = t001
        exps = decade_exponents(t001, timings, sf1)
        if exps:
            payload["decade_exponents"] = exps
    if control is not None:
        payload["control"] = control
        if control.get("noisy"):
            payload["noisy"] = True
    shared = bench_shared_pairs(spark)
    if shared is not None:
        payload["shared_pairs"] = shared
    skew = bench_skew(spark)
    if skew is not None:
        payload["skew_sf1"] = skew
    # end control re-probe + the noisy_late stamp (VERDICT r11 ask #2):
    # a quiet start no longer certifies the whole run — any control
    # deviation at midpoint or end marks the artifact, and every leg that
    # tripped the 2x anomaly retry is recorded with both readings.
    control_end = control_recheck(spark, control, "end")
    if control_mid is not None:
        payload["control_mid"] = control_mid
    if control_end is not None:
        payload["control_end"] = control_end
    if (control_mid or {}).get("noisy") or (control_end or {}).get("noisy"):
        payload["noisy_late"] = True
    if anomaly_retries:
        payload["anomaly_retries"] = anomaly_retries
    print(json.dumps(payload))
    # The driver's capture keeps only the stdout TAIL, which has truncated
    # the headline block three rounds running (BENCH_r05..r07 "parsed":
    # null). Make the artifact self-sufficient (VERDICT r7 ask #4): also
    # write the full payload to BENCH_LOCAL_r{N}.json next to this file,
    # committed each round, so cross-round tables come from a file instead
    # of reverse-arithmetic on whatever survived the tail.
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        # PROGRESS.jsonl's last line carries the live round number — the
        # authoritative source. Counting BENCH_r*.json underestimates when
        # a driver round leaves no artifact (round 10 did: this run would
        # have silently OVERWRITTEN the committed BENCH_LOCAL_r10.json).
        try:
            with open(os.path.join(here, "PROGRESS.jsonl")) as fh:
                rnd = str(json.loads(fh.readlines()[-1])["round"])
        except Exception:
            rnd = None
    if rnd is None:
        import glob
        import re

        seen = [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", f))
        ]
        seen += [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))
            if (m := re.search(r"BENCH_LOCAL_r(\d+)\.json$", f))
        ]
        rnd = str(max(seen, default=0) + 1)
    local = os.path.join(here, f"BENCH_LOCAL_r{int(rnd):02d}.json")
    if os.path.exists(local):
        # Never clobber a committed record: the r10 builder ran internal
        # sub-rounds that left BENCH_LOCAL_r11..r13 while PROGRESS still
        # said 10, so the driver-round number can collide with an
        # existing artifact. Bump past every committed index instead.
        import glob
        import re

        taken = [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))
            if (m := re.search(r"BENCH_LOCAL_r(\d+)\.json$", f))
        ]
        local = os.path.join(
            here, f"BENCH_LOCAL_r{max(taken) + 1:02d}.json"
        )
    with open(local, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"# full payload -> {local}", file=sys.stderr)


if __name__ == "__main__":
    main()

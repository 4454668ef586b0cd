"""Round-7 operator tests (VERDICT r6 asks #6/#7 and ADVICE items):

- cache lifecycle for the two-phase rank family: `release_rank_caches`
  drops every tracked persist, and the REST `handle_run_query` path
  holds executor storage FLAT across repeated calls;
- a released cache stays CORRECT on re-execution (the persist marker
  re-materializes; determinism is per-action, see operators/scan.py);
- structural no-drop guarantee for the IVF routers: a NON-subset
  coarse/super grid loses the orphan seed, never corpus rows, and
  `ivf_assign_tree(validate=True)` rejects non-subset grids eagerly;
- `be()` field-width masking in the MP4 builder: an over-width value
  wraps modulo 2^(8*nbytes) instead of silently corrupting low bytes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_value_etl_spark.operators import scan
from real_value_etl_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_hier,
    ivf_assign_tree,
)


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ---------------------------------------------------------------------------
# Rank-family cache lifecycle
# ---------------------------------------------------------------------------


def test_release_rank_caches_drops_tracked_persists(spark):
    spark.catalog.clearCache()
    scan.release_rank_caches()  # drain anything earlier tests left
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v")
    )
    ranked = scan.global_row_number(df, ["k"], "rn", n_partitions=8)
    assert ranked.count() == 5000
    assert len(scan._RANK_CACHES) == 1
    assert not _cache_empty(spark)
    assert scan.release_rank_caches() == 1
    assert not scan._RANK_CACHES
    assert _cache_empty(spark)


def test_released_cache_recomputes_correctly(spark):
    """Correctness survives a release: the persist marker re-materializes
    on the next action and every consumer inside that action shares the
    one new materialization (the label-consistency argument)."""
    spark.catalog.clearCache()
    scan.release_rank_caches()
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("one")
    )
    out = scan.global_row_number(df, ["k"], "rn", n_partitions=16)
    first = {r.k: r.rn for r in out.collect()}
    scan.release_rank_caches()  # drop the cache UNDER the live frame
    second = {r.k: r.rn for r in out.collect()}  # re-materializes
    assert first == second
    assert all(first[k] == k + 1 for k in (0, 9999, 19999))
    scan.release_rank_caches()


def test_api_requests_hold_storage_flat(spark, sf_dir):
    """r6 verdict ask #7 'Done' criterion: repeated API calls through a
    rank-family query leave no cached frames behind."""
    from real_value_etl_spark.api import handle_run_query

    spark.catalog.clearCache()
    scan.release_rank_caches()
    for _ in range(3):
        out = handle_run_query(spark, "q_ntile_deciles", sf_dir, limit=5)
        assert out["status"] == "success"
        assert not scan._RANK_CACHES
        assert _cache_empty(spark)


# ---------------------------------------------------------------------------
# IVF structural no-drop guarantee (r6 verdict ask #6)
# ---------------------------------------------------------------------------


def _vecs(spark, n=40, dim=4):
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) or 1.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_hier_non_subset_grid_drops_seed_not_vectors(spark):
    vecs = _vecs(spark)
    cents = vecs.filter(F.col("vec_id") % 5 == 0)
    # orphan coarse seed 7 is NOT a fine centroid (7 % 5 != 0)
    coarse = vecs.filter(F.col("vec_id").isin(0, 7, 20))
    out = ivf_assign_hier(vecs, cents, coarse)
    assert out.count() == 40  # no corpus row lost
    legal = {r.vec_id for r in cents.select("vec_id").collect()}
    assert {r.cluster_id for r in out.collect()} <= legal


def test_tree_non_subset_grids_drop_seeds_not_vectors(spark):
    vecs = _vecs(spark)
    cents = vecs.filter(F.col("vec_id") % 5 == 0)
    coarse = vecs.filter(F.col("vec_id").isin(0, 7, 20))  # 7 orphan
    sup = vecs.filter(F.col("vec_id").isin(0, 3))  # 3 not in coarse
    out = ivf_assign_tree(vecs, cents, coarse, sup)
    assert out.count() == 40
    legal = {r.vec_id for r in cents.select("vec_id").collect()}
    assert {r.cluster_id for r in out.collect()} <= legal


def test_tree_validate_rejects_non_subset(spark):
    vecs = _vecs(spark)
    cents = vecs.filter(F.col("vec_id") % 5 == 0)
    bad_coarse = vecs.filter(F.col("vec_id").isin(0, 7))
    sup = vecs.filter(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="subset precondition"):
        ivf_assign_tree(vecs, cents, bad_coarse, sup, validate=True)
    good_coarse = vecs.filter(F.col("vec_id").isin(0, 20))
    bad_sup = vecs.filter(F.col("vec_id") == 3)
    with pytest.raises(ValueError, match="subset precondition"):
        ivf_assign_tree(vecs, cents, good_coarse, bad_sup, validate=True)


def test_tree_subset_caller_unchanged_by_structural_guard(spark):
    """The semi-join pruning is identity for compliant callers: tree on
    subset grids still equals flat assignment when one cell spans all."""
    vecs = _vecs(spark)
    cents = vecs.filter(F.col("vec_id") % 5 == 0)
    coarse = vecs.filter(F.col("vec_id") % 20 == 0)
    sup = vecs.filter(F.col("vec_id") == 0)
    tree = {
        (r.vec_id, r.cluster_id)
        for r in ivf_assign_tree(
            vecs, cents, coarse, sup, validate=True
        ).collect()
    }
    hier = {
        (r.vec_id, r.cluster_id)
        for r in ivf_assign_hier(vecs, cents, coarse).collect()
    }
    assert tree == hier


# ---------------------------------------------------------------------------
# MP4 be() field-width masking (ADVICE)
# ---------------------------------------------------------------------------


def test_be_masks_over_width_values(spark):
    """lpad truncates the LEFTMOST hex chars when a value exceeds its
    field, corrupting low-order bytes; the mask wraps modulo the field
    width instead, matching the oracle's arithmetic."""
    from real_value_etl_spark.queries.feature_ops import (
        multimodal_mp4_header_parse,  # noqa: F401 — import proves wiring
    )

    # replicate be() on an over-width value: 2^33 + 5 in a 4-byte field
    v = F.lit((1 << 33) + 5).cast("long")
    masked = F.pmod(v, F.lit(1 << 32))
    got = spark.range(1).select(
        F.hex(F.unhex(F.lpad(F.hex(masked), 8, "0"))).alias("h")
    ).head()[0]
    assert got == "00000005"  # low 32 bits survive
    # the UNmasked lpad shape keeps the leftmost chars — the bug guarded
    unmasked = spark.range(1).select(
        F.hex(F.unhex(F.lpad(F.hex(v), 8, "0"))).alias("h")
    ).head()[0]
    assert unmasked != "00000005"


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------


def test_rrf_fuse_semantics(spark):
    """Absent-from-one-list candidates contribute 0 from that list; the
    fused ordering follows 1/(60+ra) + 1/(60+rb) with id tie-break."""
    from real_value_etl_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["qid", "vec_id", "rnk"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["qid", "vec_id", "rnk"]
    )
    rows = {
        r["vec_id"]: r
        for r in rrf_fuse(a, b, k=10, rrf_k=60).collect()
    }
    # 11 is in both lists -> highest fused score
    assert rows[11]["fused_rank"] == 1
    assert rows[11]["rank_a"] == 2 and rows[11]["rank_b"] == 1
    assert rows[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    # 10 only in A at rank 1 beats 13 only in B at rank 2
    assert rows[10]["rrf_score"] == 1.0 / 61 and rows[10]["rank_b"] == 0
    assert rows[13]["rrf_score"] == 1.0 / 62 and rows[13]["rank_a"] == 0
    assert rows[10]["fused_rank"] < rows[13]["fused_rank"]
    # equal scores tie-break by id: 12 (A rank 3) vs nothing else equal
    assert rows[12]["rrf_score"] == 1.0 / 63


def test_brute_force_topk_dot_metric(spark):
    """metric="dot" ranks by raw inner product — differs from cosine
    whenever norms vary (the fixture embeddings are unit-norm, which is
    exactly why the registered fusion query uses a truncated-dim second
    ranker instead; the dot metric is exercised here on unnormalized
    vectors)."""
    from real_value_etl_spark.operators.similarity import brute_force_topk

    # vec 2 has a huge norm: top dot neighbor of q=1 is 2 (dot 2.0 vs
    # 0.9), but its direction is mostly orthogonal -> cosine prefers 3
    # (cos ~0.993 vs ~0.196).
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 10.0]),
            (3, [0.9, 0.1]),
        ],
        ["vec_id", "embedding"],
    )
    q = emb.filter(F.col("vec_id") == 1)
    top_dot = brute_force_topk(emb, q, 1, metric="dot").head()
    top_cos = brute_force_topk(emb, q, 1, metric="cosine").head()
    assert top_dot["vec_id"] == 2
    assert top_cos["vec_id"] == 3


def test_rrf_fixture_rankers_genuinely_differ(spark, sf_dir):
    """The registered fusion query's two rankers (full-dim vs 16-dim
    truncated cosine) must produce different rank lists on the fixture —
    otherwise the fusion degenerates to a re-rank."""
    from real_value_etl_spark.operators.similarity import brute_force_topk
    from real_value_etl_spark.queries.registry import table

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    trunc = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    tq = q.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    full_set = {
        (r["qid"], r["vec_id"], r["rnk"])
        for r in brute_force_topk(emb, q, 20).collect()
    }
    trunc_set = {
        (r["qid"], r["vec_id"], r["rnk"])
        for r in brute_force_topk(trunc, tq, 20).collect()
    }
    assert full_set != trunc_set


# ---------------------------------------------------------------------------
# HyperLogLog registers (deterministic sketch)
# ---------------------------------------------------------------------------


def test_hll_registers_merge_by_max(spark, sf_dir):
    """HLL register files are mergeable by element-wise MAX: sketching
    two disjoint halves of the corpus and merging must equal sketching
    the whole — the property that makes the sketch shuffle-light at
    scale (64 bytes of state per group, combinable map-side)."""
    from real_value_etl_spark.queries.feature_ops import (
        HLL_HASH_HEX,
        HLL_M,
        HLL_W_BITS,
    )
    from real_value_etl_spark.queries.registry import table

    d = table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    hv = F.conv(F.substring(F.md5("token"), 1, HLL_HASH_HEX), 16, 10).cast("long")
    w = F.floor(F.col("hv") / HLL_M).cast("long")
    br = tok.select("doc_id", "source", hv.alias("hv")).select(
        "doc_id",
        "source",
        F.pmod("hv", F.lit(HLL_M)).cast("long").alias("bucket"),
        F.when(w == 0, F.lit(HLL_W_BITS + 1))
        .otherwise(F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
        .cast("long")
        .alias("rank"),
    )

    def regfile(frame):
        return {
            (r["source"], r["bucket"]): r["mr"]
            for r in frame.groupBy("source", "bucket")
            .agg(F.max("rank").alias("mr"))
            .collect()
        }

    whole = regfile(br)
    lo = regfile(br.filter(F.col("doc_id") % 2 == 0))
    hi = regfile(br.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for part in (lo, hi):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_hll_linear_counting_branch(spark):
    """Small cardinalities take the linear-counting lookup (corrected !=
    raw); the lookup value is the pinned literal m*ln(m/V)."""
    import math

    from real_value_etl_spark.queries.feature_ops import (
        HLL_M,
        _HLL_LC,
    )

    # the table is exactly m*ln(m/V) computed once in Python
    assert _HLL_LC[32] == HLL_M * math.log(HLL_M / 32)
    assert len(_HLL_LC) == HLL_M - 1


# ---------------------------------------------------------------------------
# HITS fixed-point (hubs & authorities)
# ---------------------------------------------------------------------------


def test_hits_fixed_point_star(spark):
    """On a bipartite star the best-connected supplier is the top hub,
    the part everyone buys is the top authority, and each side's max
    normalizes to exactly HITS_SCALE."""
    from real_value_etl_spark.operators.pagerank import (
        HITS_SCALE,
        hits_fixed_point,
    )

    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (1, 103), (2, 101)], ["src", "dst"]
    )
    hubs, auths = hits_fixed_point(edges, n_iter=2)
    h = {r["node"]: r["h"] for r in hubs.collect()}
    a = {r["node"]: r["a"] for r in auths.collect()}
    assert max(h, key=h.get) == 1 and h[1] == HITS_SCALE
    assert max(a, key=a.get) == 101 and a[101] == HITS_SCALE
    assert h[2] < HITS_SCALE and a[102] == a[103] < a[101]


# ---------------------------------------------------------------------------
# Skyline two-phase reduction == NOT EXISTS brute force
# ---------------------------------------------------------------------------


def test_skyline_two_phase_matches_bruteforce(spark):
    """The per-partition frontier + global pass must equal the O(n^2)
    dominance definition on data with duplicates and ties across
    partitions."""
    import itertools

    rows = [
        (i, float(p), s)
        for i, (p, s) in enumerate(
            [(3, 7), (3, 7), (1, 9), (2, 8), (5, 1), (5, 1), (4, 4),
             (6, 1), (2, 9), (1, 10), (7, 7), (4, 3)]
        )
    ]
    df = spark.createDataFrame(
        rows, ["p_partkey", "p_retailprice", "p_size"]
    ).repartition(5)  # scatter ties across partitions
    # brute force
    pts = [(p, s) for _, p, s in rows]
    def dominated(a):
        return any(
            b[0] <= a[0] and b[1] <= a[1] and (b[0] < a[0] or b[1] < a[1])
            for b in pts
        )
    want = {i for i, p, s in rows if not dominated((p, s))}

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    uniq = df.select("p_retailprice", "p_size").distinct()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.asc("p_retailprice"), F.asc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        uniq.withColumn("__pid", F.spark_partition_id())
        .withColumn("__pm", F.min("p_size").over(w_local))
        .filter(F.col("__pm").isNull() | (F.col("__pm") > F.col("p_size")))
        .select("p_retailprice", "p_size")
    )
    w_glob = Window.orderBy(
        F.asc("p_retailprice"), F.asc("p_size")
    ).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        local.withColumn("__gm", F.min("p_size").over(w_glob))
        .filter(F.col("__gm").isNull() | (F.col("__gm") > F.col("p_size")))
    )
    got_pts = {(r["p_retailprice"], r["p_size"]) for r in frontier.collect()}
    got = {i for i, p, s in rows if (p, s) in got_pts}
    assert got == want


# ---------------------------------------------------------------------------
# Streaming HLL: batching-independence + multi-batch MAX-merge
# ---------------------------------------------------------------------------


def test_stream_hll_state_is_batching_independent(spark, sf_dir):
    """Drain the streaming HLL twice (fresh queries) — identical register
    files and estimates both times (MAX-merge is order/batching/
    duplicate independent)."""
    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY

    fn = REGISTRY["stream_hll_distinct"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and a


def test_stream_hll_multi_batch_equals_single(spark, tmp_path):
    """Two file arrivals (two micro-batches) must converge to the SAME
    register file as one batch holding all rows — the mergeability the
    100 TB story rests on, exercised across a real micro-batch boundary."""
    import pandas as pd

    from real_value_etl_spark.streaming import jobs

    rows_a = [(i, 100 + i) for i in range(40)]
    rows_b = [(i + 40, 300 + i) for i in range(40)]
    src = str(tmp_path / "ev")
    import os

    os.makedirs(src, exist_ok=True)

    def write(name, rows):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime("2024-01-01 10:00:00"),
                "user_id": [r[1] for r in rows],
                "event_type": "click",
            }
        ).to_parquet(f"{src}/{name}.parquet")

    write("a", rows_a)
    write("b", rows_b)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            jobs._hll_state,
            outputStructType=jobs._HLL_OUT_SCHEMA,
            stateStructType=jobs._HLL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mem_hll_two_batches")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.sql("select * from mem_hll_two_batches").collect()
    assert len(drained) >= 2  # one state row per micro-batch
    final = max(drained, key=lambda r: r["est_distinct"])

    # single-batch reference: run the kernel once over all rows
    import types

    class FakeState:
        exists = False

        def update(self, v):
            self.val = v

    st = FakeState()
    pdf = pd.DataFrame({"user_id": [r[1] for r in rows_a + rows_b]})
    ref = next(jobs._hll_state(("click",), iter([pdf]), st))
    assert final["registers"] == ref["registers"][0]
    assert final["sum_geo"] == ref["sum_geo"][0]
    assert final["est_corrected"] == ref["est_corrected"][0]


# ---------------------------------------------------------------------------
# Oracle literal hygiene: the DECIMAL-parse 1-ulp bug class, gated
# ---------------------------------------------------------------------------


def test_no_bare_high_precision_decimal_literals_in_oracles():
    """DuckDB types a bare decimal literal as DECIMAL(w<=18, s) BEFORE
    any cast, silently rounding the 17th significant digit — a 1-ulp
    divergence from the Python/Spark double the literal was printed
    from (found live in the streaming-HLL linear-counting lookup).
    Literals that need full double precision must carry an exponent
    (feature_ops._dlit). This sweep fails on any oracle that contains
    a bare literal with >= 16 significant digits and no exponent."""
    import re

    from real_value_etl_spark.queries import all_queries  # noqa: F401
    from real_value_etl_spark.queries.registry import REGISTRY

    # digits on both sides of the dot counted together; exponent absent
    bare = re.compile(r"(?<![\w.])(\d+)\.(\d+)(?![\d.eE])")
    offenders = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        for m in bare.finditer(spec.oracle):
            digits = (m.group(1) + m.group(2)).lstrip("0")
            if len(digits) >= 16:
                offenders.append((name, m.group(0)))
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport goes ONLY to seeds
# ---------------------------------------------------------------------------


def test_ppr_teleport_only_to_seeds(spark):
    """A component with no seed and no path to one ends at rank 0 —
    unlike uniform PageRank, where teleport gives every node mass."""
    from real_value_etl_spark.operators.pagerank import ppr_fixed_point

    # seeded star 1<->{2,3}; disconnected pair 8<->9
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (8, 9), (9, 8)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    # EVEN iteration count: on a bipartite star the walk's mass
    # oscillates between the seed and the leaves each hop (verified by
    # hand: after 3 hops r(1)=2.58e11 < r(2)=3.71e11), so seed
    # dominance only holds on even steps — the zero-mass property for
    # unreachable nodes holds at any count.
    ranks = {
        r["node"]: r["rank"]
        for r in ppr_fixed_point(edges, seeds, n_iter=2).collect()
    }
    assert ranks[8] == 0 and ranks[9] == 0
    assert ranks[1] > ranks[2] == ranks[3] > 0  # symmetry + seed dominance

"""Round-4 regression pins: the q_approx_stats driver contract, the
connected-components string-id fallback, and the countmin top-N plan
(VERDICT r3 asks #2/#3 + ADVICE r3 items)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_value_etl_spark.queries.all_queries import REGISTRY


def test_approx_stats_rows_are_scalar_and_within_bounds(spark, sf_dir):
    """r3's only driver err: `price_quantiles: array<double>` crashed the
    rows-only canonicalizer. The contract is now scalar p50/p95/p99 —
    assert no array/map column survives, and the KLL approximations land
    within the sketch's rank-error bound of the exact percentiles."""
    df = REGISTRY["q_approx_stats"].fn(spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"non-scalar driver column: {f.name}: {f.dataType}"
    rows = {r["l_returnflag"]: r for r in df.collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.50)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        assert r["p50_price"] <= r["p95_price"] <= r["p99_price"]
        # accuracy=10000 => rank error <= n/10000; at test scale the
        # sketch is near-exact — allow 2% relative slack on the value
        for p, e in (("p50_price", "e50"), ("p95_price", "e95"), ("p99_price", "e99")):
            assert abs(r[p] - exact[flag][e]) <= 0.02 * exact[flag][e] + 1e-9, (
                flag,
                p,
                r[p],
                exact[flag][e],
            )


def test_connected_components_string_ids(spark):
    """ADVICE r3: the decimal-sum convergence shortcut is integral-only —
    string ids must take the type-agnostic changed-row fallback and still
    converge to the lexicographic-min component label."""
    from real_value_etl_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        # chain 9-10-11 (lex min '10'), pair aa-ab, singleton via self-pair
        [("9", "10"), ("10", "11"), ("aa", "ab"), ("zz", "zz")],
        ["doc_a", "doc_b"],
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert got == {
        "9": "10",
        "10": "10",
        "11": "10",
        "aa": "aa",
        "ab": "aa",
        "zz": "zz",
    }


def test_connected_components_long_string_chain_converges(spark):
    """A 6-node chain needs >1 propagation round — guards against the
    fallback exiting early (the failure mode the sum-on-strings bug
    would have produced under non-ANSI configs)."""
    from real_value_etl_spark.operators.components import connected_components

    names = [f"n{i}" for i in range(6)]
    edges = spark.createDataFrame(
        list(zip(names, names[1:])), ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert got == {n: "n0" for n in names}


def test_countmin_topn_plans_take_ordered(spark, sf_dir):
    """ADVICE r3: the top-N candidate pick must plan TakeOrderedAndProject
    (per-partition heaps), not a row_number over an unpartitioned Window
    (Exchange SinglePartition sort of the whole vocabulary)."""
    plan = REGISTRY["text_countmin_freq"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan


def test_star_components_match_minlabel_on_random_graphs(spark):
    """Large-star/small-star must produce the identical (node, component)
    labeling as min-label propagation on graphs both can solve."""
    import random

    from real_value_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    random.seed(4)
    edges = [(random.randrange(30), random.randrange(30)) for _ in range(25)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components_star(df).collect()))
    assert a == b


def test_star_components_solve_deep_chain_minlabel_refuses(spark):
    """A 60-node chain needs 59 min-label rounds — beyond the default
    budget the operator must RAISE (silently returning unconverged labels
    was the round-4 bug), while the O(log n) star variant solves it."""
    import pytest as _pytest

    from real_value_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(chain).collect()
    }
    assert got == {i: 0 for i in range(61)}
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain).collect()


def test_power_iteration_matches_exact_numpy_replay(spark, sf_dir):
    """The distributed fixed-point matvec + renormalize must equal an
    independent numpy/bigint replay of the SAME rounds exactly — and the
    Rayleigh quotient must increase over the rounds (the power-iteration
    invariant that holds on any spectrum; this corpus's Gram spectrum is
    nearly flat, ratio ~0.93, so few rounds cannot isolate the
    eigenvector itself — the operator documents the (l2/l1)^t rate)."""
    import numpy as np

    from real_value_etl_spark.queries.feature_ops import (
        GRAM_FX,
        POW_ITERS,
        POW_V_FX,
        _pow_renorm_py,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    import math

    def half_away(y):
        # Spark's round() is HALF_UP (away from zero); Python round() is
        # banker's — the one place the replay could silently diverge
        return int(math.copysign(math.floor(abs(y) + 0.5), y))

    q = np.array(
        [[half_away(float(x) * GRAM_FX) for x in r["embedding"]] for r in rows],
        dtype=object,
    )
    g = q.T @ q
    v = [POW_V_FX] * g.shape[0]

    def rayleigh(vec):
        vv = np.array(vec, dtype=object)
        num = int(vv @ (g @ vv))
        den = int(vv @ vv)
        return num / den

    r0 = rayleigh(v)
    for _ in range(POW_ITERS):
        w = [int(x) for x in (g @ np.array(v, dtype=object))]
        v = _pow_renorm_py(w)
    expected = {i: v[i] for i in range(len(v))}
    got = {
        r["i"]: r["v_fx"]
        for r in REGISTRY["emb_power_iteration"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert rayleigh(v) > r0


def test_auc_is_one_for_perfect_separation(spark):
    """Rank-sum AUC formula sanity on a constructed frame: a score that
    perfectly separates positives from negatives must yield exactly 1.0
    (and 0.5 when the score is constant)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def auc_of(rows):
        df = spark.createDataFrame(rows, ["score", "is_pos"])
        per = df.groupBy("score").agg(
            F.sum("is_pos").alias("pos"),
            F.sum(1 - F.col("is_pos")).alias("neg"),
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        cum = per.withColumn(
            "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
        )
        num = F.sum(
            2 * F.col("pos") * F.col("neg_below") + F.col("pos") * F.col("neg")
        )
        return cum.agg(
            (num.cast("double") / (F.lit(2.0) * F.sum("pos") * F.sum("neg"))).alias("auc")
        ).collect()[0]["auc"]

    perfect = [(9, 1)] * 5 + [(1, 0)] * 7
    constant = [(3, 1)] * 5 + [(3, 0)] * 7
    assert auc_of(perfect) == 1.0
    assert auc_of(constant) == 0.5


def test_silhouette_values_bounded(spark, sf_dir):
    """Weighted simplified silhouette is a (b2-a2)/max ratio aggregate —
    every cluster's value must lie in [-1, 1], and a2<=b2 by construction
    of the assignment (own centroid is the argmin), so in fact [0, 1]."""
    rows = REGISTRY["sim_silhouette"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["silhouette_w"] <= 1.0, r


def test_bfs_distance_monotone_and_seeded(spark, sf_dir):
    """Seeds are at distance 0; every other reported node's distance is
    1..BFS_HOPS and must have a neighbor one hop closer (certificate
    check over the mutual edge list)."""
    from real_value_etl_spark.queries.retrieval_graph import (
        BFS_HOPS,
        BFS_SEED_MOD,
        _knn_edges,
    )

    dist = {
        r["node"]: r["dist"]
        for r in REGISTRY["graph_bfs_distance"].fn(spark, sf_dir).collect()
    }
    edges = _knn_edges(spark, sf_dir).select("src", "dst").collect()
    mutual = set()
    directed = {(r["src"], r["dst"]) for r in edges}
    for s, d in directed:
        if (d, s) in directed:
            mutual.add((s, d))
    for node, dd in dist.items():
        if node % BFS_SEED_MOD == 0:
            assert dd == 0
        else:
            assert 1 <= dd <= BFS_HOPS
            assert any(
                dist.get(s) == dd - 1 for (s, d2) in mutual if d2 == node
            ), node


def test_stream_kmv_state_is_batching_independent(spark, sf_dir):
    """Drain the streaming KMV twice (fresh queries, whatever micro-batch
    boundaries the engine picks) — identical sketches both times."""
    fn = REGISTRY["stream_kmv_distinct"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and a


def test_asof_forward_includes_ties_and_breaks_deterministically(spark):
    """Forward as-of must treat right rows at EXACTLY the left timestamp
    as matches (>= semantics) and break equal-ts ties on the tiebreak
    column, not partition luck."""
    from real_value_etl_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame([(1, 100, 10), (2, 100, 11)], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, 10, 5), (100, 10, 3), (100, 12, 7)], ["k", "ts", "rid"]
    )
    out = {
        r["id"]: (r["next_ts"], r["next_rid"])
        for r in asof_join_forward(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_value_cols=["rid"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (10, 3)  # tie at ts=10 -> lowest rid wins
    assert out[2] == (12, 7)  # strictly-later row when no tie

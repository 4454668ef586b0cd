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

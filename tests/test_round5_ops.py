"""Round-5 operator tests.

VERDICT r4 asks #2 and #6: the global-NTILE pair must execute the
broadcast-edge plan their docstrings promise (no Exchange SinglePartition
over the customer-sized frame), and the eager-localCheckpoint contract of
the iterative connected-components operators gets a plan-SIZE regression
gate (constant plan across rounds), not just behavioral tests.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_value_etl_spark.operators.scan import (
    global_ntile,
    global_row_number,
    grouped_rank_stats,
    ntile_from_rank,
)
from real_value_etl_spark.queries.all_queries import REGISTRY


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# global_row_number / global_ntile vs the naive single-partition window
# ---------------------------------------------------------------------------


def test_global_row_number_matches_naive(spark):
    df = spark.range(3_000).select(
        ((F.col("id") * 37) % 101).alias("v"),  # heavy ties
        F.col("id").alias("k"),
    )
    order = [F.desc("v"), F.asc("k")]
    scalable = {
        r.k: r.rn
        for r in global_row_number(df, order, "rn", n_partitions=8)
        .drop("__n")
        .collect()
    }
    naive = {
        r.k: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert scalable == naive


@pytest.mark.parametrize("n_buckets", [2, 5, 7, 10])
def test_global_ntile_matches_naive(spark, n_buckets):
    """Bit-identical NTILE semantics on a frame with heavy ties in the
    value column (the custkey-style tiebreak makes the composite order
    total, so SQL's split-ties-across-buckets behavior must reproduce),
    at counts that do NOT divide evenly by the bucket count."""
    df = spark.range(1_003).select(
        ((F.col("id") * 13) % 17).alias("v"),  # ~59 rows per distinct v
        F.col("id").alias("k"),
    )
    order = [F.desc("v"), F.asc("k")]
    scalable = {
        r.k: r.b
        for r in global_ntile(df, order, n_buckets, "b", n_partitions=8).collect()
    }
    naive = {
        r.k: r.b
        for r in df.withColumn(
            "b", F.ntile(n_buckets).over(Window.orderBy(*order))
        ).collect()
    }
    assert scalable == naive


def test_global_ntile_fewer_rows_than_buckets(spark):
    """N < n buckets: SQL NTILE gives row r bucket r (first N buckets get
    one row each) — the q=0 edge case of the rank arithmetic."""
    df = spark.range(3).select(F.col("id").alias("k"))
    got = {
        r.k: r.b
        for r in global_ntile(df, [F.asc("k")], 5, "b", n_partitions=4).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3}


def test_grouped_rank_stats_matches_naive_windows(spark):
    """Per-group two-phase rank + size must reproduce ntile /
    percent_rank / cume_dist exactly, including a group so small it has
    fewer rows than buckets and a single-row group (percent_rank 0)."""
    rows = [("a", i * 7 % 50, i) for i in range(400)]
    rows += [("b", i * 3 % 11, 1000 + i) for i in range(7)]
    rows += [("c", 0, 2000)]
    df = spark.createDataFrame(rows, ["g", "v", "k"])
    stats = grouped_rank_stats(df, ["g"], [F.desc("v"), F.asc("k")], "r", "n", 8)
    got = {
        row.k: (row.b, row.p, row.c)
        for row in stats.select(
            "k",
            ntile_from_rank(F.col("r"), F.col("n"), 10).alias("b"),
            F.when(F.col("n") == 1, F.lit(0.0))
            .otherwise(
                (F.col("r") - 1).cast("double") / (F.col("n") - 1).cast("double")
            )
            .alias("p"),
            (F.col("r").cast("double") / F.col("n").cast("double")).alias("c"),
        ).collect()
    }
    win = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("k"))
    want = {
        row.k: (row.b, row.p, row.c)
        for row in df.select(
            "k",
            F.ntile(10).over(win).alias("b"),
            F.percent_rank().over(win).alias("p"),
            F.cume_dist().over(win).alias("c"),
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Plan pins: the NTILE pair runs two-phase (VERDICT r4 "What's wrong" #1)
# ---------------------------------------------------------------------------

# The decile/quintile frames may legitimately funnel BOUNDED frames into
# one task: global_ntile's per-partition count frame (n_partitions rows,
# child is HashAggregate(keys=[__pid])) and q_cumulative_gains' ten-row
# decile frame (child projects decile_rev). Anything else single-partition
# is a regression.
_BOUNDED_CHILD = re.compile(r"keys=\[__pid|decile_rev")


def _assert_single_partition_only_over_bounded_frames(plan: str) -> None:
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            child = lines[i + 1]
            assert _BOUNDED_CHILD.search(child), (
                "Exchange SinglePartition over a non-bounded frame:\n"
                + child
            )


@pytest.mark.parametrize("name", ["q_rfm_segments", "q_cumulative_gains"])
def test_ntile_queries_are_two_phase(spark, sf_dir, name):
    plan = _executed_plan(REGISTRY[name].fn(spark, sf_dir))
    # the window ntile over the customer frame is gone entirely —
    # buckets come from rank arithmetic over range-partitioned data
    assert "ntile" not in plan.lower()
    assert "rangepartitioning" in plan.lower()
    _assert_single_partition_only_over_bounded_frames(plan)


def test_grouped_ntile_query_has_no_single_partition_at_all(spark, sf_dir):
    """q_ntile_deciles partitions on a FIVE-value key — grouped_rank_stats
    computes its offsets with windows partitioned BY GROUP, so unlike the
    global queries there is no single-partition exchange anywhere."""
    plan = _executed_plan(REGISTRY["q_ntile_deciles"].fn(spark, sf_dir))
    assert "ntile" not in plan.lower()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_serialize_layout_is_two_phase(spark, sf_dir):
    plan = _executed_plan(REGISTRY["docs_serialize_layout"].fn(spark, sf_dir))
    assert "rangepartitioning" in plan.lower()
    _assert_single_partition_only_over_bounded_frames(plan)


# ---------------------------------------------------------------------------
# Plan-size gate: iterative CC plans must not grow with round count
# (VERDICT r4 ask #6 — the eager-localCheckpoint contract, pinned)
# ---------------------------------------------------------------------------


def _normalized_plan(df) -> str:
    # strip expr ids / plan ids / rdd ids so two structurally identical
    # plans from different runs compare equal
    s = df._jdf.queryExecution().analyzed().toString()
    return re.sub(r"\d+", "", s)


def _chain_edges(spark, n_nodes: int):
    return spark.range(n_nodes - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


@pytest.mark.parametrize("variant", ["minlabel", "star"])
def test_cc_plan_constant_across_rounds(spark, variant):
    """A chain of length L needs ~L min-label rounds (or ~log L star
    rounds). Without the per-round eager localCheckpoint the returned
    frame's plan tree grows with the round count (each round references
    the previous labels twice — exponential growth, reproduced as a
    driver OOM pre-r4). With it, the final plan is a checkpointed leaf:
    its ANALYZED plan must be byte-identical (modulo ids) no matter how
    many rounds ran."""
    from real_value_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    plans = []
    for n_nodes in (3, 8, 14):
        edges = _chain_edges(spark, n_nodes)
        if variant == "minlabel":
            labels = connected_components(edges, max_iterations=40)
        else:
            labels = connected_components_star(edges, max_iterations=40)
        # correctness while we're here: one chain = one component
        assert labels.select("component").distinct().count() == 1
        plans.append(_normalized_plan(labels))
    assert plans[0] == plans[1] == plans[2], (
        "iterative CC plan grows with round count — the eager "
        "localCheckpoint contract (operators/components.py) regressed"
    )

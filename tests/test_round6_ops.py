"""Round-6 operator tests: skew-proof two-phase sessionize, exact-integer
NTILE arithmetic, and the hier-IVF coverage fallback (VERDICT r5 asks #7
and the two ADVICE items)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_value_etl_spark.operators.sessionize import (
    sessionize,
    sessionize_two_phase,
)

GAP = 1800


def _skewed_events(spark, n_hot=400, n_cold_keys=7, n_cold=25):
    """One hot key owning ~70% of rows plus several cold keys; timestamps
    engineered so session boundaries fall on arbitrary rows, including
    partition edges once range-partitioned 8 ways."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    t = base
    for i in range(n_hot):
        # alternate dense runs and >gap jumps so the hot key has many
        # sessions, some of which must straddle range-partition edges
        step = 60 if i % 9 else GAP + 120
        t = t + dt.timedelta(seconds=step)
        rows.append((1000, t, float(i)))
    for k in range(n_cold_keys):
        t = base
        for i in range(n_cold):
            step = 300 if i % 4 else GAP + 60
            t = t + dt.timedelta(seconds=step + k)
            rows.append((k, t, float(i)))
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


@pytest.mark.parametrize("n_partitions", [3, 8, 16])
def test_sessionize_two_phase_matches_naive(spark, n_partitions):
    df = _skewed_events(spark)
    naive = {
        (r.user_id, r.ts): r.session_seq
        for r in sessionize(df, "user_id", "ts", GAP).collect()
    }
    two = {
        (r.user_id, r.ts): r.session_seq
        for r in sessionize_two_phase(
            df, "user_id", "ts", GAP, n_partitions=n_partitions
        ).collect()
    }
    assert two == naive
    # sanity: the fixture really exercises multi-session keys
    assert max(naive.values()) > 10


def test_sessionize_two_phase_single_row_keys(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=k), 1.0) for k in range(20)],
        ["user_id", "ts", "value"],
    )
    out = sessionize_two_phase(df, "user_id", "ts", GAP, n_partitions=8)
    assert {r.session_seq for r in out.collect()} == {1}


def test_sessionize_two_phase_no_key_wide_window(spark):
    """The data-sized window must partition on (__b, key) — the
    deterministic time bucket — never on the bare key: the whole point is
    that a hot key's rows spread across buckets. Only the O(#keys)
    boundary frame may use a per-key window. No `rangepartitioning` may
    appear anywhere: the bucket is a VALUE-derived expression precisely
    because SQL range exchanges sample nondeterministically (the
    consistency hazard documented in operators/scan.py)."""
    df = _skewed_events(spark)
    plan = (
        sessionize_two_phase(df, "user_id", "ts", GAP, n_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()
    # every Window node over the event rows carries the bucket in its spec
    for line in plan.splitlines():
        if "Window " in line and "session" not in line and "__c" in line:
            assert "__b" in line


def test_sessionize_two_phase_repeat_executions_identical(spark):
    """Regression for the range-exchange consistency hazard (see
    operators/scan.py module doc): repeated executions must produce the
    IDENTICAL row set — the pre-fix implementation nondeterministically
    dropped rows at partition boundaries because the offsets join saw a
    different partition labeling than the data path."""
    df = _skewed_events(spark, n_hot=600, n_cold_keys=9, n_cold=40)
    runs = [
        sorted(
            (r.user_id, r.ts, r.session_seq)
            for r in sessionize_two_phase(df, "user_id", "ts", GAP).collect()
        )
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == df.count()


def test_global_row_number_repeat_executions_identical(spark):
    """Same hazard, rank family: the persist() in operators/scan.py makes
    every consumer read one materialized partitioning. 20k rows exceed
    the range sampler's coverage (32 x 100), the regime where unpersisted
    double execution could disagree."""
    from real_value_etl_spark.operators.scan import global_row_number

    df = spark.range(20_000).select(
        ((F.col("id") * 2654435761) % 1000003).alias("v"),
        F.col("id").alias("k"),
    )
    runs = [
        sorted(
            (r.k, r.rn)
            for r in global_row_number(df, [F.asc("v"), F.asc("k")], "rn")
            .drop("__n")
            .collect()
        )
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == 20_000
    assert {rn for _, rn in runs[0]} == set(range(1, 20_001))


# queries whose plans reference a partitioned/derived frame from MULTIPLE
# consumers — the class the range-exchange hazard lives in. Each runs
# twice; the collected results must be identical.
_MULTI_CONSUMER_QUERIES = (
    "q_rfm_segments",
    "q_cumulative_gains",
    "q_ntile_deciles",
    "events_running_total",
    "docs_serialize_layout",
    "events_sessionize_scalable",
    "sim_knn_graph",
    "docs_dsir_select",  # r7: global rank over the per-doc score frame
)


@pytest.mark.parametrize("name", _MULTI_CONSUMER_QUERIES)
def test_multi_consumer_queries_deterministic(spark, sf_dir, name):
    from real_value_etl_spark.queries.all_queries import REGISTRY

    fn = REGISTRY[name].fn
    rows = [
        sorted(map(str, fn(spark, sf_dir).collect())) for _ in range(2)
    ]
    assert rows[0] == rows[1], f"{name}: two executions disagree"


def test_ntile_from_rank_exact_beyond_double_mantissa(spark):
    """floor(a / b) over doubles rounds above 2^53 — the integral-div
    rewrite must place ranks around a huge bucket boundary exactly.
    n = 2^60, buckets = 4 => boundary at rank 2^58 (q = 2^58, rem = 0)."""
    from real_value_etl_spark.operators.scan import ntile_from_rank

    n = 1 << 60
    q = n // 4
    ranks = [1, q - 1, q, q + 1, 2 * q, 2 * q + 1, 3 * q, 3 * q + 1, n]
    want = [min((r - 1) // q + 1, 4) for r in ranks]
    df = spark.createDataFrame([(r,) for r in ranks], ["r"])
    got = [
        row.b
        for row in df.select(
            ntile_from_rank(F.col("r"), F.lit(n).cast("long"), 4).alias("b")
        ).collect()
    ]
    assert got == want


def test_ivf_assign_hier_subset_precondition_covers_ties(spark):
    """With coarse SUBSET-OF fine (the documented precondition, ADVICE
    r5), no vector is ever dropped — including the one adversarial case:
    two IDENTICAL coarse seed vectors, where the higher-gid seed's cell
    is vacated but vectors follow the same tie-break to the surviving
    cell."""
    from real_value_etl_spark.operators.similarity import ivf_assign_hier

    def vdf(rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    # seeds 0 and 5 are byte-identical vectors; both are fine centroids
    cents = vdf(
        [
            (0, [1.0, 0.0]),
            (5, [1.0, 0.0]),
            (7, [0.0, 1.0]),
            (9, [0.7, 0.7]),
        ]
    )
    coarse = vdf([(0, [1.0, 0.0]), (5, [1.0, 0.0]), (7, [0.0, 1.0])])
    vecs = vdf(
        [(i, [1.0 - 0.1 * i, 0.1 * i]) for i in range(11)]
    )
    out = ivf_assign_hier(vecs, cents, coarse, validate=True).collect()
    assert {r.vec_id for r in out} == set(range(11)), "vector dropped"
    # the vacated cell (gid 5) received nothing; its twin got everything
    # routed near axis 0
    assigned = {r.vec_id: r.cluster_id for r in out}
    assert all(c in {0, 5, 7, 9} for c in assigned.values())


def test_ivf_assign_tree_degrades_to_hier(spark):
    """With an EMPTY or single-seed super grid the three-level router
    must produce exactly the two-level result (the regime every driver
    correctness scale sits in — the fixed oracle text depends on it)."""
    from real_value_etl_spark.operators.similarity import (
        ivf_assign_hier,
        ivf_assign_tree,
    )

    def vdf(rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    import math

    vecs = vdf(
        [
            (i, [math.cos(i * 0.17), math.sin(i * 0.17)])
            for i in range(60)
        ]
    )
    cents = vecs.filter(F.col("vec_id") % 5 == 0)
    coarse = vecs.filter(F.col("vec_id") % 20 == 0)
    hier = {
        r.vec_id: r.cluster_id
        for r in ivf_assign_hier(vecs, cents, coarse).collect()
    }
    empty_sup = coarse.filter(F.lit(False))
    one_sup = coarse.filter(F.col("vec_id") == 0)
    for sup in (empty_sup, one_sup):
        tree = {
            r.vec_id: r.cluster_id
            for r in ivf_assign_tree(vecs, cents, coarse, sup).collect()
        }
        assert tree == hier
    # ACTIVE super level: still assigns every vector, cells restricted
    two_sup = coarse.filter(F.col("vec_id").isin(0, 40))
    tree = {
        r.vec_id: r.cluster_id
        for r in ivf_assign_tree(vecs, cents, coarse, two_sup).collect()
    }
    assert set(tree) == set(hier), "tree router dropped vectors"


def test_ivf_assign_hier_validate_rejects_non_subset(spark):
    from real_value_etl_spark.operators.similarity import ivf_assign_hier

    def vdf(rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    coarse = vdf([(99, [0.0, 1.0])])  # not a fine centroid
    cents = vdf([(10, [1.0, 0.05])])
    vecs = vdf([(0, [1.0, 0.01])])
    with pytest.raises(ValueError, match="subset"):
        ivf_assign_hier(vecs, cents, coarse, validate=True)

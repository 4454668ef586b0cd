"""Semantic unit tests for the round-3 retrieval/sketch/graph operators —
properties the oracle-parity gate can't express (parity proves Spark ==
DuckDB; these prove both compute the RIGHT thing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_value_etl_spark.queries import all_queries  # noqa: F401
from real_value_etl_spark.queries.registry import REGISTRY


def test_containment_catches_subset_quote(spark):
    """A short document fully embedded in a longer one has containment 1.0
    on the short side even though Jaccard is well below the near-dup
    threshold — the case symmetric dedup structurally misses."""
    from real_value_etl_spark.operators.dedup import containment_pairs

    short = " ".join(f"w{i}" for i in range(30))
    longer = short + " " + " ".join(f"x{i}" for i in range(15))
    noise = " ".join(f"n{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, longer), (3, noise)], ["doc_id", "text"]
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["cont_a"], r["cont_b"])
        for r in containment_pairs(df, "doc_id", "text", 0.7).collect()
    }
    assert (1, 2) in pairs
    cont_a, cont_b = pairs[(1, 2)]
    assert cont_a == 1.0  # every shingle of the short doc is in the long
    assert cont_b < 0.7  # the long doc is NOT mostly the short one
    # and the Jaccard of this pair is below the near-dup threshold: the
    # short doc has 28 shingles, the long one 43, all 28 shared
    assert 28 / 43 < 0.7
    assert all(3 not in p for p in pairs)


def test_countmin_estimates_are_one_sided(spark, sf_dir):
    """Count-Min error is ONE-SIDED by construction: the estimate never
    undercounts. Checked on the real corpus output."""
    rows = REGISTRY["text_countmin_freq"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_est"] >= r["n_exact"]
        assert r["overcount"] == r["n_est"] - r["n_exact"]


def test_token_budget_sample_respects_budget(spark, sf_dir):
    """Every source's kept token mass stays within the budget, and a
    non-trivial sample is actually taken when supply exceeds budget."""
    from real_value_etl_spark.queries.corpus_quality import (
        BUDGET_TOKENS_PER_SOURCE,
    )

    rows = REGISTRY["docs_token_budget_sample"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["tokens_kept"] <= BUDGET_TOKENS_PER_SOURCE
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["tokens_total"] > BUDGET_TOKENS_PER_SOURCE:
            assert r["n_kept"] < r["n_total"]


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    """The defining property: every near-dup component maps to exactly ONE
    split."""
    df = REGISTRY["docs_leakage_safe_split"].fn(spark, sf_dir)
    violated = (
        df.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert violated == 0


def test_knn_graph_mutual_edges_are_symmetric(spark, sf_dir):
    """Every mutual edge's reverse is present and also mutual; rnk is
    within k."""
    from real_value_etl_spark.queries.retrieval_graph import KNN_GRAPH_K

    edges = REGISTRY["sim_knn_graph"].fn(spark, sf_dir)
    rows = edges.collect()
    eset = {(r["src"], r["dst"]): r["mutual"] for r in rows}
    assert all(1 <= r["rnk"] <= KNN_GRAPH_K for r in rows)
    for (s, d), mutual in eset.items():
        if mutual:
            assert eset.get((d, s)) is True


def test_pq_distortion_nonnegative_and_exact_dup_code_equal(spark, sf_dir):
    """PQ codes are equal for identical vectors, and distortion is a sum
    of squares (>= 0)."""
    enc = REGISTRY["sim_pq_encode"].fn(spark, sf_dir)
    rows = enc.collect()
    assert all(r["distortion"] >= 0.0 for r in rows)
    # the 16 codebook seed vectors encode to themselves: distortion 0
    from real_value_etl_spark.queries.feature_ops import PQ_K, PQ_SEED_MOD

    zero = [r for r in rows if r["vec_id"] % PQ_SEED_MOD == 0]
    zero_sorted = sorted(zero, key=lambda r: r["vec_id"])[:PQ_K]
    assert all(r["distortion"] == 0.0 for r in zero_sorted)


def test_minhash_slots_are_decorrelated(spark):
    """Regression pin for the MINHASH_P fix: two docs sharing ~a third of
    their shingles must agree on SOME but not ALL of the 16 signature
    slots. With the broken modulus (2^61-1, never wrapped) every slot was
    a monotone transform of the same argmin shingle, so agreement was
    always 0/16 or 16/16 and banded LSH degenerated to single-hash
    collisions."""
    from real_value_etl_spark.operators.dedup import minhash_signatures

    a = " ".join(f"w{i}" for i in range(40))
    b = " ".join(f"w{i}" for i in range(20)) + " " + " ".join(
        f"y{i}" for i in range(20)
    )
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    sig = {r["did"]: r for r in minhash_signatures(df, "doc_id", "text").collect()}
    agree = sum(sig[1][f"mh{i}"] == sig[2][f"mh{i}"] for i in range(16))
    assert 0 < agree < 16, f"signature slots still correlated: {agree}/16"

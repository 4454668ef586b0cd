#!/usr/bin/env python
"""r12 probes: minhash docset persist, star-CC intermediate distinct,
per-query timing of touched legs. Run on a QUIET host.

Usage: python tools/r12_probe2.py <mode> [sf_dir]
  modes: minhash | star | legs | jacsf1
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from real_value_etl_spark.operators import dedup as D
from real_value_etl_spark.queries import all_queries  # noqa: F401
from real_value_etl_spark.queries.registry import REGISTRY, table
from real_value_etl_spark.session import get_spark


def timed(spark, fn, n=3, warm=1):
    for _ in range(warm):
        spark.catalog.clearCache()
        fn().count()
    reads = []
    for _ in range(n):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn().count()
        reads.append(round(time.perf_counter() - t0, 3))
    return reads


def minhash_persist(docs, threshold):
    """minhash_lsh_pairs with the docset frame persisted (one build, two
    cached verify reads) — candidate generation unchanged."""
    idx = D.shingle_index(docs, "doc_id", "text")
    cands = D.lsh_candidate_pairs(D._minhash_sig(idx))
    docsets = (
        idx.groupBy("did")
        .agg(F.collect_list("sh").alias("shs"), F.count("*").alias("n"))
        .persist()
    )
    a = docsets.select(
        F.col("did").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("n").alias("n_a")
    ).hint("shuffle_hash")
    b = docsets.select(
        F.col("did").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("n").alias("n_b")
    ).hint("shuffle_hash")
    inter = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b"))).cast("double")
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def star_nodistinct(edges, max_iterations=20):
    """connected_components_star without the intermediate ls.distinct()."""
    from real_value_etl_spark.operators.components import (  # noqa
        connected_components_star,
    )
    import real_value_etl_spark.operators.components as C

    cur = (
        edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    selfs = edges.select(F.col("doc_a").alias("node")).filter(
        F.col("doc_a") == F.col("doc_b")
    )

    def large_star(e):
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = F.least(F.col("a"), F.col("mn"))
        return (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(e):
        oriented = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = oriented.groupBy("u").agg(F.min("v").alias("mn"))
        linked = oriented.join(mins, "u").select(
            F.col("v").alias("x"), F.col("mn").alias("m")
        )
        selfl = mins.select(F.col("u").alias("x"), F.col("mn").alias("m"))
        return linked.unionByName(selfl).filter(F.col("x") != F.col("m"))

    converged = False
    cur_count = cur.count()
    for _ in range(max_iterations):
        ls = large_star(cur).select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        nxt = (
            small_star(ls)  # <-- no .distinct() here
            .select(F.least("x", "m").alias("a"), F.greatest("x", "m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nxt_count = nxt.count()
        stable = nxt_count == cur_count and nxt.exceptAll(cur).limit(1).count() == 0
        cur.unpersist()
        cur = nxt
        cur_count = nxt_count
        if stable:
            converged = True
            break
    assert converged
    sym = cur.unionByName(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"), F.least("a", "b").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    iso = (
        selfs.distinct()
        .join(labels.select(F.col("node").alias("__ln")),
              F.col("node") == F.col("__ln"), "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    out = labels.unionByName(iso)
    cur.unpersist()
    return out


def main():
    mode = sys.argv[1]
    sf = (
        sys.argv[2]
        if len(sys.argv) > 2 and mode not in ("legs",)
        else "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name=f"r12-probe-{mode}")
    docs = table(spark, sf, "documents")

    if mode == "minhash":
        cur = lambda: D.minhash_lsh_pairs(docs, "doc_id", "text", 0.5)
        new = lambda: minhash_persist(docs, 0.5)
        a = sorted(map(tuple, cur().collect()))
        b = sorted(map(tuple, new().collect()))
        print("equal:", a == b, len(a))
        spark.catalog.clearCache()
        print("current:", timed(spark, cur))
        print("persist:", timed(spark, new))
    elif mode == "star":
        from real_value_etl_spark.operators.components import (
            connected_components_star,
        )

        pairs = lambda: D.ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", 0.5
        ).select("doc_a", "doc_b")
        cur = lambda: connected_components_star(pairs(), "doc_a", "doc_b")
        new = lambda: star_nodistinct(pairs())
        a = sorted(map(tuple, cur().collect()))
        b = sorted(map(tuple, new().collect()))
        print("equal:", a == b, len(a))
        spark.catalog.clearCache()
        print("current:", timed(spark, cur))
        print("nodistinct:", timed(spark, new))
    elif mode == "legs":
        for name in sys.argv[2:] or [
            "dedup_jaccard_prefix",
            "graph_components_star",
            "text_tfidf_cosine_pairs",
            "docs_span_pair_dedup",
            "text_bpe_train",
            "text_suffix_lcp_dedup",
            "dedup_minhash_lsh",
        ]:
            spec = REGISTRY[name]
            reads = timed(
                spark, lambda: spec.fn(spark, "/root/testdata/sf0.1"), n=2, warm=2
            )
            print(f"{name}: min {min(reads):.3f}  {reads}")
    elif mode == "jacsf1":
        from tools.make_sf1 import ensure_sf1

        sf1 = ensure_sf1()
        d1 = table(spark, sf1, "documents")
        for name, fn in {
            "prefix_sf1": lambda: D.ngram_jaccard_pairs_prefix(
                d1, "doc_id", "text", 0.5
            ),
        }.items():
            reads = timed(spark, fn, n=2, warm=1)
            print(f"{name}: min {min(reads):.3f}  {reads}")


if __name__ == "__main__":
    main()

# --- same-session A/B of old vs new formulations (old rebuilt inline from
# the still-present helpers) -------------------------------------------------

def old_prefix_pairs(docs, threshold=0.5):
    idx = D.shingle_index(docs, "doc_id", "text")
    cands = D.prefix_filtered_candidates(idx, threshold)
    a, b, inter = D._docset_sides(idx)
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def ab_main():
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r12-ab")
    docs = table(spark, sf, "documents")
    pairs = {
        "jaccard_old": lambda: old_prefix_pairs(docs),
        "jaccard_new": lambda: D.ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", 0.5
        ),
    }
    for name, fn in pairs.items():
        reads = timed(spark, fn, n=3, warm=1)
        print(f"{name}: min {min(reads):.3f}  {reads}")
    # interleave a second arm to cancel drift
    for name, fn in pairs.items():
        reads = timed(spark, fn, n=2, warm=0)
        print(f"{name} (arm2): min {min(reads):.3f}  {reads}")


if sys.argv[1:2] == ["ab"]:
    ab_main()

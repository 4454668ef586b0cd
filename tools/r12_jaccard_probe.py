#!/usr/bin/env python
"""r12 optimization probe: jaccard prefix-filter pipeline variants.

Compares the shipped ngram_jaccard_pairs_prefix against a PACKED-docset
rewrite (one aggregation produces the (df,sh)-sorted shingle array per
doc; prefix, length filter and verify all read that one frame, optionally
persisted) for bit-identical output and wall clock.

Usage: python tools/r12_jaccard_probe.py [check|time] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from real_value_etl_spark.operators import dedup as D
from real_value_etl_spark.queries.registry import table
from real_value_etl_spark.session import get_spark

JACCARD_THRESHOLD = 0.5


def packed_docsets(df: DataFrame, id_col: str, text_col: str, threshold: float) -> DataFrame:
    idx = D.shingle_index(df, id_col, text_col)
    dfreq = idx.groupBy("sh").agg(F.count("*").alias("df"))
    return (
        idx.join(dfreq, "sh")
        .groupBy("did")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("ord"),
            F.count("*").alias("n"),
        )
        .select(
            "did",
            F.col("ord.sh").alias("shs"),
            "n",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
            .cast("int")
            .alias("p"),
        )
    )


def pairs_packed(
    df: DataFrame, id_col: str, text_col: str, threshold: float, persist: bool
) -> DataFrame:
    packed = packed_docsets(df, id_col, text_col, threshold)
    if persist:
        packed = packed.persist()
    pf = packed.select(
        "did", "n", F.explode(F.slice("shs", F.lit(1), F.col("p"))).alias("sh")
    )
    a, b = pf.alias("a"), pf.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.did") < F.col("b.did"))
            & (F.col("b.n") >= F.lit(threshold) * F.col("a.n"))
            & (F.col("a.n") >= F.lit(threshold) * F.col("b.n")),
        )
        .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .distinct()
    )
    sa = packed.select(
        F.col("did").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("n_a"),
    ).hint("shuffle_hash")
    sb = packed.select(
        F.col("did").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n").alias("n_b"),
    ).hint("shuffle_hash")
    inter = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b"))).cast("double")
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="r12-jaccard-probe")
    docs = table(spark, sf_dir, "documents")

    if mode == "check":
        cur = D.ngram_jaccard_pairs_prefix(docs, "doc_id", "text", JACCARD_THRESHOLD)
        for persist in (False, True):
            new = pairs_packed(docs, "doc_id", "text", JACCARD_THRESHOLD, persist)
            a = sorted(map(tuple, cur.collect()))
            b = sorted(map(tuple, new.collect()))
            print(f"persist={persist}: rows {len(a)} vs {len(b)}, equal={a == b}")
            assert a == b, "MISMATCH"
            spark.catalog.clearCache()
        print("CHECK OK", sf_dir)
        return

    def timed(fn, n=3):
        fn().count()  # warm
        reads = []
        for _ in range(n):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn().count()
            reads.append(round(time.perf_counter() - t0, 3))
        return reads

    variants = {
        "current": lambda: D.ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", JACCARD_THRESHOLD
        ),
        "packed_nopersist": lambda: pairs_packed(
            docs, "doc_id", "text", JACCARD_THRESHOLD, False
        ),
        "packed_persist": lambda: pairs_packed(
            docs, "doc_id", "text", JACCARD_THRESHOLD, True
        ),
    }
    for name, fn in variants.items():
        reads = timed(fn)
        print(f"{name}: min {min(reads):.3f}s  readings {reads}")


if __name__ == "__main__":
    main()

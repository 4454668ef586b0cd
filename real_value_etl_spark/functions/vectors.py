"""Vector (embedding) column functions — Spark expressions + DuckDB mirrors.

Cosine/dot are sequential left-folds over the array in BOTH engines
(`F.aggregate` in Spark, `list_dot_product` in DuckDB iterate in index
order), so double-precision results are bit-identical — verified empirically
across the full sf0.01 embeddings table. Everything stays JVM-side
(higher-order array expressions, no UDFs) so ANN scans participate in
whole-stage codegen.

Scale design: brute-force top-k is O(n·q) with the query side broadcast —
the right baseline up to ~10^5 queries; the IVF path (operators/similarity)
prunes candidates by centroid assignment for the 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order => deterministic doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) with the exact operation order of the oracle mirror."""
    return dot(a, b) / (norm(a) * norm(b))


# --------------------------- DuckDB SQL mirrors ---------------------------


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )

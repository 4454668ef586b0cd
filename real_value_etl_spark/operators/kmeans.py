"""Distributed Lloyd's k-means over an embedding column (IVF training).

The IVF ANN query (queries/llm.py sim_ann_ivf) probes pre-existing
cluster seeds; this operator TRAINS those centroids at corpus scale —
the index-build half of the similarity-search story. It is the repo's
iterative-algorithm pattern: per-iteration work is two narrow Spark jobs
(assign = pure codegen expressions; update = one hash-agg), and only the
k x dim centroid matrix ever reaches the driver — never the data.

Plan shape per iteration:
- ASSIGN: centroids ship as ONE `from_json` literal (constant-folded;
  k separate fold expressions would explode codegen — measured on the
  LSH hyperplanes) and a single `F.transform` computes all k squared
  distances; `array_position(min)` picks the cluster. No UDF, no shuffle.
- UPDATE: `posexplode` the vectors into (cluster, dim, value) and one
  groupBy(cluster, dim) average rebuilds centroids — a single shuffle of
  k*dim partial aggregates (map-side combined), collected to the driver
  (k*dim doubles, bytes not gigabytes).

Empty clusters keep their previous centroid. Iteration count is fixed by
the caller (deterministic plans; convergence is monitored by WCSS, which
is non-increasing for Lloyd's).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add `cluster` (argmin squared distance) and `dist2` columns."""
    cents = F.from_json(
        F.lit(json.dumps(centroids)), "array<array<double>>"
    )
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec_col), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        df.withColumn("__d", dists)
        .withColumn("dist2", F.array_min("__d"))
        .withColumn(
            "cluster", (F.array_position("__d", F.col("dist2")) - 1).cast("int")
        )
        .drop("__d")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    init: list[list[float]],
    n_iter: int = 3,
) -> tuple[list[list[float]], DataFrame]:
    """Run `n_iter` Lloyd's iterations from `init`; returns the trained
    centroids and the final assigned DataFrame (cluster, dist2 added)."""
    centroids = [list(map(float, c)) for c in init]
    k, dim = len(centroids), len(centroids[0])
    assigned = _assign(df, vec_col, centroids)
    for _ in range(n_iter):
        parts = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new = [row[:] for row in centroids]  # empty clusters keep position
        for r in parts:
            new[r.cluster][r.dim] = r.mean
        centroids = new
        assigned = _assign(df, vec_col, centroids)
    return centroids, assigned


def kmeans_wcss(assigned: DataFrame) -> float:
    """Within-cluster sum of squares of an assignment (monitoring)."""
    return assigned.agg(F.sum("dist2")).collect()[0][0]

"""Connected components over a pair/edge list — dedup CLUSTERS from
near-dup PAIRS (the step after MinHash/SimHash: each component keeps one
canonical document).

Algorithm: iterative min-label propagation to a fixpoint — every node's
label converges to the minimum doc id reachable from it, which is exactly
the component id a recursive-CTE oracle computes. The driver loop runs
O(diameter) Spark jobs; near-dup components are tiny (pairs/triples), so
2-3 iterations converge. At 100 TB scale swap in the large-star/small-star
variant (alternating conditional propagation halves long chains) — the
per-iteration dataflow (join edges→labels, min-aggregate) is identical.

Each iteration: one join of the edge list against current labels + one
min-aggregate — two shuffles on node id, both AQE-coalesced. Labels are
persisted per iteration (consumed by the join, the aggregate, and the
convergence check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component = min
    node id in the connected component. Deterministic."""
    # the neighbor join probes sym on `b` every round: hash-partition the
    # cached edge list on the join key ONCE so iterations re-use the
    # layout instead of re-shuffling it (same trick as the PageRank edge
    # cache, operators/pagerank.py)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .repartition("b")
        .dropDuplicates(["a", "b"])
        .persist()
    )
    # init = min over {self} ∪ neighbors — the first propagation round
    # folded into the label build (same single groupBy a distinct-node
    # init would cost, one fewer driver round-trip to converge; pair and
    # triangle components are already final here)
    labels = (
        sym.select(F.col("a").alias("node"), F.least("a", "b").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .persist()
    )

    def one_round(lbl: DataFrame) -> DataFrame:
        neighbor = sym.join(lbl, sym.b == lbl.node).select(
            F.col("a").alias("node"), "component"
        )
        return (
            lbl.select("node", "component")
            .unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )

    # Convergence check without a join — VALID ONLY FOR INTEGRAL IDS:
    # min-label propagation only ever DECREASES a node's numeric
    # component, so the total label sum strictly decreases until the
    # fixpoint — comparing sums is equivalent to comparing label sets,
    # and the aggregate doubles as the action that materializes each
    # block's persist (one job per block instead of a join + filter +
    # count over both label sets). (Lazily fusing TWO rounds per job was
    # tried and regresses ~2x: the inner round's uncached subtree feeds
    # both the join and the union of the outer round, so it executes
    # twice — recompute beats the saved barrier.)
    #
    # With string ids the cast throws under ANSI (or nulls out the sum
    # under non-ANSI, exiting after one round with unconverged labels),
    # and numeric-STRING ids would mis-converge because lexicographic min
    # does not monotonically decrease the numeric sum — so non-integral
    # label types fall back to the type-agnostic changed-row join
    # (ADVICE r3).
    integral = isinstance(
        labels.schema["component"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )

    def label_sum(lbl: DataFrame):
        # decimal(38,0) keeps the sum exact at any node-id/corpus scale
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]

    if integral:
        prev_sum = label_sum(labels)
        for _ in range(max_iterations):
            new_labels = one_round(labels).persist()
            new_sum = label_sum(new_labels)
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    else:
        for _ in range(max_iterations):
            new_labels = one_round(labels).persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
    sym.unpersist()
    return labels.select("node", "component")


def dedup_clusters(pairs: DataFrame, id_col_a: str, id_col_b: str) -> DataFrame:
    """Dedup groups from near-dup pairs: (node, component, is_keeper) where
    the keeper is the minimum id of each component."""
    comp = connected_components(pairs, id_col_a, id_col_b)
    return comp.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )

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
eagerly localCheckpoint-ed per iteration (consumed by the join, the
aggregate, and the convergence check; the checkpoint also truncates the
per-round logical plan, which otherwise doubles every iteration).
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
    # Each round's plan references the previous labels TWICE (self ∪
    # neighbor), so a lazily-persisted chain DOUBLES the logical plan per
    # iteration — persist caches execution but not analysis, and the
    # exponential plan tree OOMs the driver past ~8 rounds (reproduced on
    # a 30-node graph). Eager localCheckpoint truncates the plan to a
    # materialized leaf each round, keeping plan size constant.
    labels = (
        sym.select(F.col("a").alias("node"), F.least("a", "b").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .localCheckpoint(eager=True)
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

    converged = False
    if integral:
        prev_sum = label_sum(labels)
        for _ in range(max_iterations):
            new_labels = one_round(labels).localCheckpoint(eager=True)
            new_sum = label_sum(new_labels)
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
    else:
        for _ in range(max_iterations):
            new_labels = one_round(labels).localCheckpoint(eager=True)
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
                converged = True
                break
    sym.unpersist()
    if not converged:
        # min-label needs O(diameter) rounds — returning silently here
        # would hand back WRONG labels on a deep graph (a 60-node chain
        # needs 59 rounds). Deep graphs belong to the O(log n)
        # large-star/small-star variant below.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the budget); raise "
            "max_iterations or use connected_components_star"
        )
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


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Large-star/small-star connected components — the O(log n)-round
    alternation for graphs whose components are too deep or too hubby for
    plain min-label propagation (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14; public algorithm).

    Per round, entirely as joins + min-aggregates (no neighbor arrays are
    ever collected, so hub nodes cost one shuffled row per edge, not one
    giant buffer):

    - large-star: every node u links its LARGER neighbors to
      m(u) = min(N(u) ∪ {u}) — long chains halve; hubs fan their heavy
      side directly at the minimum.
    - small-star: orienting each edge under its larger endpoint, u links
      its smaller-or-equal neighbors and itself to the minimum — stars
      contract.

    The edge set converges to a forest of stars rooted at each
    component's minimum id; labels read off as min(neighbor ∪ self).
    Convergence is checked EXACTLY (`exceptAll` both directions is
    empty), type-agnostic — string ids work unchanged. Output:
    (node, component), identical to `connected_components` (min-label)
    and to the recursive-CTE oracle; `max_iterations` bounds the driver
    loop (log₂ diameter rounds in practice).

    Unlike min-label (whose per-round lineage is one join against a
    PERSISTED static edge list), each star round derives its edge set
    from the previous round's — a lazily-persisted chain re-analyzes and
    (on any cache miss) recomputes the whole history, which is the
    classic iterative-Spark lineage blow-up. Every round therefore cuts
    lineage with an EAGER `localCheckpoint` (executor-storage
    materialization, the same device GraphFrames uses for its iterative
    algorithms); the two `exceptAll` probes then compare two
    materialized frames, nothing re-derives.
    """
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # isolated self-pairs (u,u) carry membership but no structure
    selfs = edges.select(F.col(src).alias("node")).filter(
        F.col(src) == F.col(dst)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = F.least(F.col("a"), F.col("mn"))
        return (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        # e is canonical (a < b): group each edge under its larger end b
        oriented = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = oriented.groupBy("u").agg(F.min("v").alias("mn"))
        linked = oriented.join(mins, "u").select(
            F.col("v").alias("x"), F.col("mn").alias("m")
        )
        selfl = mins.select(F.col("u").alias("x"), F.col("mn").alias("m"))
        return linked.unionByName(selfl).filter(F.col("x") != F.col("m"))

    converged = False
    # Convergence probe is COUNT-GATED: both frames are distinct sets, so
    # |cur| == |nxt| together with nxt \ cur == ∅ already implies set
    # equality — one exceptAll instead of two, and rounds whose edge
    # count changed (most pre-convergence rounds) skip the exceptAll
    # shuffle entirely. Counts on eagerly-checkpointed frames are cheap
    # (no recompute), and cur's count is carried from the previous round.
    # At corpus scale each avoided exceptAll is a full shuffle of the
    # edge set — this halves the probe cost of the iteration.
    cur_count = cur.count()
    for _ in range(max_iterations):
        ls = large_star(cur).select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        # r12: the intermediate ls.distinct() was dropped — duplicates in
        # the large-star output change neither small_star's mins (dups
        # collapse in the map-side partial agg) nor the final distinct'd
        # edge set, so the extra (a, b) exchange per round bought nothing.
        # Measured at sf0.1: graph_components_star 5.80 -> 4.80 s
        # (min-of-3, same session), output verified identical.
        nxt = (
            small_star(ls)
            .select(F.least("x", "m").alias("a"), F.greatest("x", "m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nxt_count = nxt.count()
        stable = (
            nxt_count == cur_count
            and nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur.unpersist()
        cur = nxt
        cur_count = nxt_count
        if stable:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_iterations} rounds"
        )
    sym = cur.unionByName(
        cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
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

"""Connected components over near-duplicate candidate pairs.

Pair generation (minhash/jaccard/simhash/embedding LSH) yields EDGES;
a real dedup pipeline needs CLUSTERS — if A~B and B~C, all three are
one duplicate group even when (A,C) never collides — so it can keep
exactly one canonical document per group. This module turns the edge
list into a (node, component) assignment with pure DataFrame ops.

Algorithm: iterative min-label propagation. Every node starts
labelled with itself; each round every node takes the minimum label
among itself and its neighbors; fixpoint = each node labelled with
the smallest node id in its component. Rounds needed = graph
diameter, and near-dup graphs are forests of tiny dense clusters
(diameter 1-3), so 3-5 rounds is typical. For adversarial
long-chain graphs the alternating star algorithms (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converge in
O(log^2 n) rounds with the same join-shape per round; the propagation
step here is the building block either way.

Scale shape per round: one shuffle join (messages = neighbor labels,
keyed by edge src) + one partial-aggregated groupBy min. The
symmetrized edge list is persisted ONCE pre-partitioned on the join
key so every round reuses the same layout instead of re-shuffling
the edges. `localCheckpoint` truncates the lineage each round —
without it the plan doubles per iteration and the job dies on plan
explosion long before data size matters. On a real cluster with
flaky executors use reliable `checkpoint()` (HDFS-backed) instead;
local mode has no re-execution risk.

Frames ref: no equivalent (Frames stops at pairwise comparisons,
e.g. Overlap.hs row equality); clustering is part of the scale
extension surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    smallest node id reachable via undirected edges. Deterministic:
    the fixpoint is unique regardless of partitioning or iteration
    order.

    Rounds needed = graph DIAMETER — right for near-dup forests
    (diameter 1-3), wrong for adversarial chains. Rather than return
    silently-partial labels when ``max_iter`` is exhausted, raises
    RuntimeError directing callers to ``connected_components_star``
    (O(log^2 n) rounds on any graph). ``stats['rounds']`` reports the
    rounds executed when a dict is passed."""
    from frames_spark.operators.caching import cache_scope

    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # distinct both dedups (pair generators may emit a pair once per
    # band) and lets the per-round join reuse one compact layout.
    # Every action on sym happens inside this function (the labels
    # are eagerly checkpointed each round), so the persist is scoped:
    # released on ANY exit, including the non-convergence raise.
    with cache_scope(sym.distinct().repartition("a")) as (sym,):
        return _cc_minlabel_rounds(sym, max_iter, stats)


def _cc_minlabel_rounds(sym, max_iter, stats):
    # Round 1 folded into initialization (r14 opt): with identity
    # labels the first propagation needs no join — every node's new
    # label is min(self, min of its neighbors), ONE aggregate over
    # the symmetric edge list (node appears as `b` once per incident
    # edge; least(a, b) covers the self label). Saves a full
    # join+checkpoint round on every call.
    labels = (
        sym.select(
            F.col("b").alias("node"), F.least("a", "b").alias("component")
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .localCheckpoint(eager=False)
    )
    # convergence probe. Numeric ids: sum of labels is strictly
    # decreasing until fixpoint — DECIMAL(38,0) so the probe can't
    # overflow at any node count (sum-of-longs can wrap at ~10^10
    # nodes x 10^9 ids). Non-numeric ids (string entities): the
    # star-CC (count, xxhash64-sum) checksum — labels still only
    # decrease per node, so any round that changes anything changes
    # the (node, component) multiset the hash folds over.
    numeric = labels.schema["component"].dataType.typeName() in {
        "long", "integer", "short", "byte", "decimal",
    }

    def _label_sum(df: DataFrame):
        if numeric:
            return df.agg(
                F.sum(F.col("component").cast("decimal(38,0)"))
            ).first()[0]
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")),
            ).first()
        )

    # The checkpoints above and per round are LAZY: the convergence
    # probe right after each build is the action that materializes
    # them, so every round costs ONE job (join+aggregate+store+probe)
    # instead of an eager-checkpoint job followed by a probe job.
    prev_sum = _label_sum(labels)
    converged = False
    rounds = 1  # the folded initialization IS the first propagation
    for _ in range(max_iter - 1):
        rounds += 1
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "component"
        )
        labels = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if max_iter == 1 and not converged:
        # The loop above never runs, so an already-converged (or
        # empty) graph would spuriously raise (r14 ADVICE). One
        # PROBE-ONLY confirm pass: compute what one propagation
        # would produce and compare checksums — labels themselves
        # are not advanced and rounds stays 1, because at fixpoint
        # the pass changes nothing and on a change we raise anyway.
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "component"
        )
        probe = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        converged = _label_sum(probe) == prev_sum
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "the graph has long chains (diameter > max_iter). Use "
            "connected_components_star, which converges in O(log^2 n) "
            "rounds on any topology."
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): same (node, component = min reachable id) contract as
    ``connected_components``, but O(log^2 n) rounds — in practice a
    handful — on ANY topology, including the pathological chains that
    cost min-label propagation O(diameter) rounds. Per round: two
    groupBy-min + join passes over the edge list only; lineage is
    truncated per round (localCheckpoint; use reliable checkpoint on
    a real cluster).

    large-star: every node attaches its LARGER neighbors to the
    minimum of its neighborhood (incl. itself); small-star: every
    node attaches its smaller neighbors AND itself to its minimum
    neighbor. The edge set contracts monotonically into a star
    forest rooted at each component's minimum id."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def _checksum(df: DataFrame):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()

    converged = False
    rounds = 0
    prev = None
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized neighborhood
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("mb", "a").alias("m"))
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: edges now point large -> small
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        e = (
            large.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        cur = _checksum(e)
        if prev is not None and tuple(cur) == tuple(prev):
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint is a star forest: every edge points node -> root
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = (
        e.select(F.col("b").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return (
        labels.union(roots).groupBy("node").agg(F.min("component").alias("component"))
    )


def attach_components(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Left-join component labels onto a full table; rows with no
    near-dup edge become singleton components labelled by their own
    id. Adds ``component`` and ``is_canonical`` (the row to KEEP —
    exactly one true per component)."""
    comp = components.select(
        F.col("node").alias(id_col), F.col("component").alias("__comp")
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn("component", F.coalesce(F.col("__comp"), F.col(id_col)))
        .drop("__comp")
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )


def update_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Incremental maintenance: merge a NEW edge batch into an
    existing (node, component) labeling without reclustering history.

    The existing clustering re-enters as STAR edges (node ->
    component) — a graph of diameter <= 2 whatever the original
    topology looked like — so min-label propagation over
    (stars UNION new_edges) converges in O(diameter of the NEW
    structure) rounds: the cost of an incremental update is bounded
    by the arriving batch, not by how many billions of pairs built
    the old clusters. This is the ingest-shard pattern at 100 TB:
    cluster each day's candidate pairs, fold them into yesterday's
    labels, never touch the full pair history again.

    Output labels remain canonical (smallest reachable node id), so
    repeated folding is associative: update(update(L, e1), e2) ==
    components(e1 ∪ e2 ∪ L-as-edges). Proven equal to the full
    recompute in tests.
    """
    stars = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    # singleton clusters carry no star edge; keep their nodes alive
    # via self-loop-free union handled below (CC emits every node
    # appearing in SOME edge, so pure singletons untouched by new
    # edges must be re-attached afterwards)
    merged = connected_components(
        stars.unionByName(new_edges.select(F.col(src), F.col(dst))),
        src,
        dst,
        max_iter=max_iter,
        stats=stats,
    )
    untouched = labels.join(merged, "node", "left_anti")
    return merged.unionByName(untouched)

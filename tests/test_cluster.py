"""Connected components (dedup/cluster.py): the large-star/small-star
variant must agree with min-label propagation on realistic near-dup
graphs AND converge in O(log n)-ish rounds on the pathological chain
where propagation needs O(diameter) — plus the propagation guard that
refuses to return silently-partial labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_spark.dedup.cluster import (
    connected_components,
    connected_components_star,
)


def _labels(df) -> dict:
    return {r.node: r.component for r in df.collect()}


def _chain(spark, n: int):
    """Path graph 0-1-2-...-n-1: diameter n-1, the propagation
    worst case."""
    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def test_star_matches_propagation_on_clusters(spark):
    """Forest of dense clusters (the near-dup shape): identical
    labels from both algorithms."""
    # 40 cliques of 5: node = 5*c + i, edges within each clique
    edges = (
        spark.range(200)
        .select(
            (F.col("id") / 5).cast("long").alias("c"),
            F.col("id").alias("src"),
        )
        .withColumn("dst", F.col("c") * 5 + (F.col("src") + 1) % 5)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    want = _labels(connected_components(edges))
    got = _labels(connected_components_star(edges))
    assert got == want
    # every clique labelled by its min member
    assert all(comp == (node // 5) * 5 for node, comp in got.items())


def test_star_converges_fast_on_chain(spark):
    """256-node path: diameter 255. Star must converge in a handful
    of rounds (O(log^2 n), in practice ~log n) and label every node
    with the chain's minimum."""
    stats: dict = {}
    labels = _labels(connected_components_star(_chain(spark, 256), stats=stats))
    assert stats["rounds"] <= 12, f"star took {stats['rounds']} rounds"
    assert set(labels.values()) == {0}
    assert len(labels) == 256


def test_propagation_raises_instead_of_partial_labels(spark):
    """min-label propagation on a chain longer than max_iter must
    REFUSE (RuntimeError), never return partial labels silently."""
    with pytest.raises(RuntimeError, match="connected_components_star"):
        connected_components(_chain(spark, 64), max_iter=10)


def test_propagation_round_count_is_diameter_bound(spark):
    """On a short chain, propagation converges and reports rounds on
    the order of the diameter — the measured evidence for why the
    star variant exists."""
    stats: dict = {}
    labels = _labels(connected_components(_chain(spark, 9), stats=stats, max_iter=25))
    assert set(labels.values()) == {0}
    # min label travels one hop per round: ~diameter rounds (8), +1
    # for the fixpoint-detection round
    assert 4 <= stats["rounds"] <= 10


def test_star_matches_propagation_on_random_graph(spark):
    """Deterministic pseudo-random sparse graph: same components."""
    edges = (
        spark.range(500)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(300)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 1_000_000), F.lit(300)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    want = _labels(connected_components(edges, max_iter=25))
    got = _labels(connected_components_star(edges))
    assert got == want and len(got) > 0


def test_update_components_equals_full_recompute(spark):
    """Folding edge batches incrementally == clustering the union,
    including merges ACROSS old clusters and untouched singletons."""
    from frames_spark.dedup.cluster import (
        connected_components,
        update_components,
    )

    batch1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 30)], ["src", "dst"]
    )
    # batch 2 merges cluster {1,2,3} with {10,11}, extends {20,21},
    # and introduces a brand-new cluster {40,41}
    batch2 = spark.createDataFrame(
        [(3, 10), (21, 22), (40, 41)], ["src", "dst"]
    )
    l1 = connected_components(batch1)
    inc = {
        (r["node"], r["component"])
        for r in update_components(l1, batch2).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in connected_components(batch1.unionByName(batch2)).collect()
    }
    assert inc == full
    # associativity: a third fold still matches
    batch3 = spark.createDataFrame([(22, 40)], ["src", "dst"])
    inc2 = {
        (r["node"], r["component"])
        for r in update_components(
            update_components(l1, batch2), batch3
        ).collect()
    }
    full2 = {
        (r["node"], r["component"])
        for r in connected_components(
            batch1.unionByName(batch2).unionByName(batch3)
        ).collect()
    }
    assert inc2 == full2


def test_update_components_bounded_rounds(spark):
    """Old-cluster topology must NOT leak into incremental cost: a
    long chain clustered once re-enters as stars, so folding one new
    edge converges in a handful of rounds instead of re-walking the
    chain's diameter."""
    from frames_spark.dedup.cluster import (
        connected_components_star,
        update_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["src", "dst"]
    )
    labels = connected_components_star(chain)
    stats: dict = {}
    new_edge = spark.createDataFrame([(100, 101)], ["src", "dst"])
    out = update_components(labels, new_edge, stats=stats)
    assert stats["rounds"] <= 4
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp[60] == 0 and comp[101] == 100

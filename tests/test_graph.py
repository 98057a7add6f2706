"""Integer PageRank (operators/graph.py): bit-determinism across
layouts, bounded mass, and sane structure-following."""

from __future__ import annotations

from frames_spark.operators.graph import pagerank


def _star(spark):
    # hub 0 connected to 1..8, plus a detached pair (9, 10)
    edges = [(0, i) for i in range(1, 9)] + [(9, 10)]
    return spark.createDataFrame(edges, ["src", "dst"])


def test_pagerank_hub_dominates(spark):
    ranks = {
        r["node"]: r["rank_micros"]
        for r in pagerank(_star(spark), iterations=10).collect()
    }
    hub = ranks[0]
    assert all(hub > ranks[n] for n in range(1, 9))
    # spokes are symmetric -> identical ranks
    assert len({ranks[n] for n in range(1, 9)}) == 1
    # the detached pair is symmetric too
    assert ranks[9] == ranks[10]


def test_pagerank_layout_invariant(spark):
    e = _star(spark)
    r1 = sorted(tuple(r) for r in pagerank(e, iterations=7).collect())
    r2 = sorted(
        tuple(r) for r in pagerank(e.repartition(5), iterations=7).collect()
    )
    assert r1 == r2


def test_pagerank_mass_bounded(spark):
    """Integer division leaks at most deg-1 micros per node per
    round: total mass stays within iterations * nodes * max_deg of
    the initial n * 1e6 (and never grows)."""
    e = _star(spark)
    rows = pagerank(e, iterations=10).collect()
    total = sum(r["rank_micros"] for r in rows)
    n = len(rows)
    assert total <= n * 1_000_000
    assert total >= n * 1_000_000 - 10 * n * 16 - n * 1_000_000 * 0.02

"""Graph analytics on edge lists (the co-purchase/co-occurrence
graphs the engine already builds without self-joins; connected
components live in dedup/cluster.py, triangles/degrees in the query
layer).

``pagerank`` runs in EXACT INTEGER micros: float PageRank sums
incoming contributions in partition order, so two runs of the same
graph can differ in the last ulps — poison for this engine's
reproducibility contract. Integer division (contrib = rank DIV deg)
loses at most deg-1 micro-units per node per round (conserved mass
drifts ~1e-6/round, far below ranking noise) and addition of longs is
exactly commutative, so ranks are bit-identical across layouts, runs
and cluster sizes. Fixed iteration count, lineage truncated per round
(localCheckpoint — reliable checkpoint on a real cluster), state is
only the O(nodes) rank table; each round is one join + one groupBy
keyed on the edge list's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank_micros) after ``iterations`` rounds over the
    UNDIRECTED edge list; ranks start at 1e6 per node."""
    from frames_spark.operators.caching import tie_cache

    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().repartition("a").persist()

    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    out = sym.join(deg, "a").select("a", "b", "deg").persist()

    ranks = deg.select(
        F.col("a").alias("node"), F.lit(1_000_000).alias("rank_micros")
    )
    base = 1_000_000 * (100 - damping_pct) // 100
    for _ in range(iterations):
        contribs = (
            out.join(
                ranks.select(
                    F.col("node").alias("a"), "rank_micros"
                ),
                "a",
            )
            .select(
                F.col("b").alias("node"),
                F.expr("rank_micros DIV deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = contribs.select(
            "node",
            (
                F.lit(base)
                + F.expr(f"in_sum * {damping_pct} DIV 100")
            ).alias("rank_micros"),
        ).localCheckpoint(eager=False)
    # The returned frame is LAZY and reads `out` once per round at
    # materialization: an eager unpersist here (the pre-r10 form)
    # threw the cache away before the first action and recomputed the
    # edge join `iterations` times. tie_cache keeps both relations
    # cached while the caller holds the result, then releases them.
    return tie_cache(ranks, out, sym)

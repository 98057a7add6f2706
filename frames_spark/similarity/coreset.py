"""k-center coreset selection: farthest-point traversal (Gonzalez
1985, "Clustering to minimize the maximum intercluster distance") —
the classic 2-approximation for k-center and a standard coreset /
diverse-subset selector for training-data curation (pick k maximally
spread examples).

Greedy rule: seed with the minimum id; each round add the point
whose distance to its NEAREST chosen center is LARGEST (ties to the
lowest id). Exact integer geometry: vectors are 2^20 fixed-point
longs (functions/vectors.py), squared L2 distances are exact integer
sums (components < 2^22 -> a 64-dim dist2 < 2^50), so every argmax
is deterministic on any engine or partition layout and the WHOLE
k-round trace carries a full DuckDB oracle (unrolled MATERIALIZED
CTEs — the q_markov_stationary device for iterative algorithms).

Scale posture: one corpus scan per round with the chosen centers as
a constant-folded literal matrix (k * dim longs — driver-bounded by
construction, the BPE "one driver row per iteration" shape); no
join, no shuffle beyond the single-row argmax reduce. k rounds cost
k scans — for k beyond tens, switch the scan to a persisted fixed
relation (done here) so the parquet read happens once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.embedding import _fixed
from frames_spark.functions.vectors import const_int_matrix


def _min_dist2(centers: list[list[int]]) -> F.Column:
    """Exact integer min squared-L2 from ``fvec`` to the literal
    center matrix — ONE data-driven transform, constant-folded, built
    as one parsed expr (the greedy traversal rebuilds this every
    round, so the per-literal py4j cost compounds O(k^2 d) without
    const_int_matrix)."""
    mat = const_int_matrix(centers)
    dists = F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(F.col("fvec"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_min(dists)


def kcenter_select(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> list[tuple[int, int, int]]:
    """Greedy k-center trace: [(round, id, dist2_to_nearest_center)].
    Round 0 is the min-id seed at distance 0."""
    from frames_spark.operators.caching import cache_scope

    with cache_scope(_fixed(df, id_col, vec_col)) as (fixed,):
        # min-id row in ONE TakeOrdered job (was two: agg(min) then
        # filter+first — guide §5, driver/job overhead)
        seed_row = fixed.orderBy("vid").first()
        seed = seed_row["vid"]
        trace = [(0, seed, 0)]
        centers = [list(seed_row["fvec"])]
        for rnd in range(1, k):
            best = (
                fixed.select("vid", "fvec", _min_dist2(centers).alias("mind"))
                .orderBy(F.desc("mind"), F.asc("vid"))
                .first()
            )
            trace.append((rnd, best["vid"], best["mind"]))
            centers.append(list(best["fvec"]))
    return trace


def kcenter_trace_df(
    spark, df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> DataFrame:
    """The selection trace as a DataFrame (round, vec_id, dist2)."""
    rows = kcenter_select(df, id_col, vec_col, k)
    return spark.createDataFrame(
        rows, "round long, vec_id long, dist2 long"
    )


def assign_to_centers(
    df: DataFrame, id_col: str, vec_col: str, centers: list[list[int]]
) -> DataFrame:
    """(id, center_idx, dist2): each point assigned to its nearest
    selected center (ties to the lowest center index) — the coreset
    partition induced by the traversal. One scan, no shuffle."""
    fixed = _fixed(df, id_col, vec_col)
    mat = const_int_matrix(centers)
    scored = F.transform(
        mat,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("fvec"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
            i.alias("idx"),
        ),
    )
    best = F.array_min(scored)
    return fixed.select(
        F.col("vid").alias(id_col),
        best["idx"].cast("long").alias("center_idx"),
        best["d2"].alias("dist2"),
    )

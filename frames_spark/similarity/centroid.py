"""Per-group embedding centroids (mean vectors).

The scale shape: `posexplode` the vector column so the work is a
plain (group, position) aggregate — partial-aggregated map-side,
shuffled once on the composite key, never a per-group collect of
whole vectors. Component sums accumulate as exact integer micros
(floor(x*1e6+0.5)) so the result is bit-stable across engines and
partition orders; the mean is one float division at the end.

Reassembly into an array is a second tiny aggregate over ``dim``
rows per group (sort_array over (pos, val) structs — deterministic).

Frames ref: vector columns don't exist in Frames; this is the
similarity-search support surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def component_means(
    df: DataFrame, group: str, vec_col: str = "embedding"
) -> DataFrame:
    """Long form: (group, pos, mean) — one row per vector component.
    pos is 0-based. Exact integer sums; one float division."""
    exploded = df.select(
        group, F.posexplode(vec_col).alias("pos", "__v")
    ).withColumn("__vm", F.floor(F.col("__v").cast("double") * 1000000 + 0.5).cast("long"))
    agg = exploded.groupBy(group, "pos").agg(
        F.sum("__vm").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    mean = (F.col("__s").cast("double") / F.lit(1000000.0)) / F.col("__n").cast(
        "double"
    )
    return agg.select(group, F.col("pos").cast("long").alias("pos"), mean.alias("mean"))


def centroids(df: DataFrame, group: str, vec_col: str = "embedding") -> DataFrame:
    """(group, centroid: array<double>) — components in position order."""
    long_form = component_means(df, group, vec_col)
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("pos"), F.col("mean")))
    )
    return long_form.groupBy(group).agg(
        F.transform(pairs, lambda s: s["mean"]).alias("centroid")
    )

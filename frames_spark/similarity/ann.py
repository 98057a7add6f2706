"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query set is broadcast
(it's small by definition), so the corpus is scanned exactly once
with no shuffle of the corpus side; top-k per query via window.

Scale path: hyperplane-LSH bucketed search (probe only the query's
bucket), reusing dedup/embedding.py's deterministic planes. An IVF
(k-means coarse quantizer) variant is the roadmap item for round 2+ —
same probe structure, learned centroids instead of hash planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from frames_spark.dedup.embedding import _fixed, fixed_with_buckets
from frames_spark.functions.vectors import cosine_from_fixed, dot_fixed


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    (query_id, neighbor_id, cosine, rank) — self-matches excluded.
    """
    q = _fixed(queries, id_col, vec_col).select(
        F.col("vid").alias("query_id"),
        F.col("fvec").alias("qvec"),
        F.col("n2").alias("qn2"),
    )
    c = _fixed(corpus, id_col, vec_col).select(
        F.col("vid").alias("neighbor_id"),
        F.col("fvec").alias("cvec"),
        F.col("n2").alias("cn2"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            cosine_from_fixed(
                dot_fixed(F.col("qvec"), F.col("cvec")), F.col("qn2"), F.col("cn2")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 4,
) -> DataFrame:
    """Bucketed ANN: compare each query only against corpus vectors in
    its hyperplane bucket. Recall < 1 by design; scales as corpus/2^p
    per bucket."""
    c = fixed_with_buckets(corpus, id_col, vec_col, num_planes).select(
        F.col("vid").alias("neighbor_id"),
        F.col("fvec").alias("cvec"),
        F.col("n2").alias("cn2"),
        "bucket",
    )
    q = fixed_with_buckets(queries, id_col, vec_col, num_planes).select(
        F.col("vid").alias("query_id"),
        F.col("fvec").alias("qvec"),
        F.col("n2").alias("qn2"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            cosine_from_fixed(
                dot_fixed(F.col("qvec"), F.col("cvec")), F.col("qn2"), F.col("cn2")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )

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


def multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 6,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. VLDB'07): each query probes its
    own hyperplane bucket PLUS every Hamming-distance-1 neighbor
    bucket (the buckets a borderline sign flip would have put it in).
    One plane set at Hamming-1 probing recovers most of the recall
    that plain lsh_topk loses, for (num_planes+1) bucket lookups per
    query instead of num_tables re-hashes of the corpus — the corpus
    is hashed and shuffled ONCE, which is the economics that matter
    at 100 TB (probing is query-side fan-out; tables are corpus-side
    fan-out).

    A corpus vector lives in exactly one bucket and the probe set is
    distinct, so no (query, neighbor) pair forms twice — no dedup
    before the exact cosine."""
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
    b = F.col("bucket")
    flips = [
        F.concat(
            F.substring(b, 1, i - 1),
            F.when(F.substring(b, i, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.expr(f"substring(bucket, {i + 1})"),
        )
        for i in range(1, num_planes + 1)
    ]
    qp = q.select(
        "query_id",
        "qvec",
        "qn2",
        F.explode(F.array_distinct(F.array(b, *flips))).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(qp), "bucket")
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

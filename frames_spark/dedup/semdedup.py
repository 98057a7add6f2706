"""SemDeDup-style cluster-bounded semantic deduplication.

Published pipeline (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication",
arXiv:2303.09540): k-means-cluster the embedding space, compare pairs
ONLY within a cluster, and drop all but one of every group of
semantic duplicates (cosine >= threshold). The clustering bounds the
quadratic term — per-cluster pair expansion replaces the corpus-wide
all-pairs scan, and because k grows with the corpus, cluster sizes
(and so the per-cluster cost) stay bounded at 100 TB.

This implementation swaps the trained k-means codebook for a
DETERMINISTIC spherical codebook: centroid ``c``'s components are ±1
by bit d of an md5 stream (salt ``semc-<c>-<chunk>``) — the same
device as ``embedding.plane_components``. Assignment is
``argmax_c dot(v, s_c)``: every codebook vector has norm sqrt(dim),
so the exact integer fixed-point dot argmax IS the cosine argmax
(ties break to the lowest centroid id). A trained codebook clusters
tighter; the deterministic one makes the ENTIRE pipeline —
assignment, candidate pairs, drops — reproducible bit-for-bit in the
DuckDB oracle, the same trade q_dedup_embed_lsh makes for its LSH
planes. Recall vs a trained codebook is a clustering-quality matter,
not a correctness one: within-cluster pair semantics are exact.

Keep rule: in every similar pair (cosine >= threshold) the LARGER id
is dropped — the deterministic min-id-survivor variant of the
paper's keep-farthest-from-centroid (greedy, no connected-components
pass; a doc similar to any kept lower id is dropped).

Reference parity note: the Frames reference (Haskell) has no
embedding surface; this module is part of the §2b LLM-pipeline
extension scope.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.embedding import _fixed
from frames_spark.functions.vectors import (
    const_int_matrix,
    cosine_from_fixed,
    dot_fixed,
)

# Library default for the degenerate-cluster guard. 4000 members is
# ~8M in-array pairs from one collect_list row — a bounded single-task
# expansion. The previous default (100_000) permitted ~5e9 pairs from
# one degenerate cluster (a ~50 MB row whose i<j expansion lands on a
# single task); the registered queries always passed 4000 explicitly,
# but "a guard that exists one parameter away still OOMs the run that
# forgot it" (the editdist.py stop-shingle lesson) — so the guarded
# value IS the default. Size a production run's k so clusters stay far
# below this, and check with semdedup_cluster_stats() first.
DEFAULT_MAX_CLUSTER = 4000


def centroid_components(c: int, dim: int) -> list[int]:
    """±1 components of deterministic codebook centroid ``c`` — bit d
    of the md5 stream md5('semc-<c>-<chunk>'). No RNG state:
    reproducible across runs, engines, and cluster versions."""
    comps: list[int] = []
    chunk = -1
    bits = 0
    while len(comps) < dim:
        if len(comps) % 128 == 0:
            chunk += 1
            digest = hashlib.md5(f"semc-{c}-{chunk}".encode()).digest()
            bits = int.from_bytes(digest, "big")
        comps.append(1 if (bits >> (len(comps) % 128)) & 1 else -1)
    return comps


def _codebook(n_centroids: int, dim: int) -> F.Column:
    """The codebook as ONE constant-folded 2-D literal array — a
    single data-driven transform instead of n_centroids unrolled dot
    expressions (keeps plan size flat as k grows), built as ONE
    parsed SQL literal rather than nested F.array/F.lit calls (each
    F.lit is a py4j round-trip; see embedding._sign_array for the
    measured driver-side cost of the storm)."""
    return const_int_matrix(
        centroid_components(c, dim) for c in range(n_centroids)
    )


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """(vid, fvec, n2, cluster): each vector tagged with its nearest
    codebook centroid. ONE pass over the corpus, no shuffle — the
    codebook is a plan literal, the argmax is an array_max over
    struct(dot, -c) so ties break to the lowest centroid id."""
    fixed = _fixed(df, id_col, vec_col)
    scored = F.transform(
        _codebook(n_centroids, dim),
        lambda comp, i: F.struct(
            dot_fixed(F.col("fvec"), comp).alias("dot"),
            (-i).alias("negc"),
        ),
    )
    best = F.array_max(scored)
    return fixed.withColumn("cluster", (-best["negc"]).cast("int"))


def _clustered(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int, dim: int
) -> DataFrame:
    """(cluster, vs): each cluster's members gathered into one sorted
    array — the shared input for pair expansion AND membership
    accounting. ONE shuffle, keyed by cluster id."""
    assigned = assign_clusters(df, id_col, vec_col, n_centroids, dim)
    return (
        assigned.select("cluster", F.struct("vid", "fvec", "n2").alias("v"))
        .groupBy("cluster")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
    )


def semdedup_cluster_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Pre-flight for the semantic tier (the q_lsh_bucket_stats
    pattern): (cluster_size, n_clusters, pairs_per_cluster) sorted by
    size. Run this BEFORE semdedup_pairs on a new corpus/k: a top row
    whose pairs_per_cluster is astronomical means k is too small (or
    the corpus is degenerate) and the max_cluster guard will be
    dropping real clusters. Cost: the same one-shuffle assignment as
    the dedup itself, but aggregating counts instead of arrays."""
    assigned = assign_clusters(df, id_col, vec_col, n_centroids, dim)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * (F.col("cluster_size") - 1) / 2)
            .cast("long")
            .alias("pairs_per_cluster"),
        )
        .orderBy(F.desc("cluster_size"))
    )


def _pairs_from_clustered(
    clustered: DataFrame, threshold: float, max_cluster: int | None
) -> DataFrame:
    clusters = clustered.filter(F.size("vs") >= 2)
    if max_cluster is not None:
        clusters = clusters.filter(F.size("vs") <= max_cluster)
    pairs = F.expr(
        "flatten(transform(vs, (x, i) ->"
        " transform(slice(vs, i + 2, size(vs)),"
        " y -> struct(x AS a, y AS b))))"
    )
    cand = clusters.select(
        "cluster", F.explode(pairs).alias("p")
    ).select(
        F.col("p.a.vid").alias("id_a"),
        F.col("p.b.vid").alias("id_b"),
        "cluster",
        cosine_from_fixed(
            dot_fixed(F.col("p.a.fvec"), F.col("p.b.fvec")),
            F.col("p.a.n2"),
            F.col("p.b.n2"),
        ).alias("cosine"),
    )
    return cand.filter(F.col("cosine") >= threshold)


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    threshold: float = 0.9,
    dim: int = 64,
    max_cluster: int | None = DEFAULT_MAX_CLUSTER,
) -> DataFrame:
    """(id_a, id_b, cluster, cosine): within-cluster pairs at or above
    the cosine threshold, id_a < id_b. Candidate generation is ONE
    groupBy on the cluster id with in-array i<j expansion (the
    near_dup_pairs_lsh shape) — the corpus shuffles once, the
    fixed-point lineage executes once, and no pair is ever formed
    across clusters. ``max_cluster`` drops degenerate clusters (a
    corpus collapsing onto one codebook cell) before the quadratic
    expansion; at production scale k is sized so clusters stay far
    below it."""
    clustered = _clustered(df, id_col, vec_col, n_centroids, dim)
    return _pairs_from_clustered(clustered, threshold, max_cluster)


def semdedup_drops(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    threshold: float = 0.9,
    dim: int = 64,
    max_cluster: int | None = DEFAULT_MAX_CLUSTER,
) -> DataFrame:
    """(vec_id, cluster) of DROPPED documents: the larger id of every
    within-cluster pair at or above the threshold, distinct."""
    pairs = semdedup_pairs(
        df, id_col, vec_col, n_centroids, threshold, dim, max_cluster
    )
    return pairs.select(
        F.col("id_b").alias("vec_id"), "cluster"
    ).distinct()


def semdedup_summary(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    threshold: float = 0.9,
    dim: int = 64,
    max_cluster: int | None = DEFAULT_MAX_CLUSTER,
) -> DataFrame:
    """Per-cluster dedup accounting: (cluster, n_members, n_dropped,
    over_cap). Clusters with no members never appear; n_dropped counts
    distinct dropped ids (a doc in several hot pairs drops once).
    ``over_cap`` marks clusters the ``max_cluster`` guard SKIPPED —
    their n_dropped reads 0 because no pairs were expanded, not
    because they are duplicate-free (r9 advice #4: the guard must
    never be a silent cap; ``SELECT * WHERE over_cap`` is the audit,
    and a nonzero count means re-run with a larger k or cap). Both
    legs — membership counts and pair expansion — read ONE persisted
    clustered relation, so the corpus is scanned and assigned
    exactly once (the q_dedup_summary shingle-index pattern)."""
    clustered = _clustered(df, id_col, vec_col, n_centroids, dim).persist()
    over = (
        F.size("vs") > F.lit(max_cluster)
        if max_cluster is not None
        else F.lit(False)
    )
    members = clustered.select(
        "cluster",
        F.size("vs").cast("long").alias("n_members"),
        over.alias("over_cap"),
    )
    drops = (
        _pairs_from_clustered(clustered, threshold, max_cluster)
        .select(F.col("id_b").alias("vec_id"), "cluster")
        .distinct()
    )
    dropped = drops.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    from frames_spark.operators.caching import tie_cache

    return tie_cache(
        members.join(dropped, "cluster", "left").select(
            "cluster",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            "over_cap",
        ),
        clustered,
    )

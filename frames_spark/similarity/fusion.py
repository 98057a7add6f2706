"""Reciprocal-Rank Fusion for hybrid retrieval (Cormack, Clarke &
Buettcher, SIGIR 2009): fuse rankings from heterogeneous retrieval
legs (lexical, embedding, ...) by summing 1/(k + rank) per document.
RRF needs no score calibration between legs — only ranks — which is
why it is the default fusion in production hybrid search.

Determinism: each leg's rank is a row_number under a STRICT total
order (score desc, id asc), and each reciprocal is the exact integer
1000000 DIV (k + rank), so fused scores are exact integer sums —
bit-identical on any engine or partition layout. Documents outside a
leg's ``depth`` cutoff contribute 0 from that leg (standard
truncated-list RRF).

Scale posture: legs arrive already ranked and truncated (≤ depth
rows per query per leg — bounded relations); fusion is a union +
one groupBy keyed by (query, doc). The expensive work lives in the
legs, which each use their own bounded candidate generation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 60,
    topk: int | None = 10,
) -> DataFrame:
    """Fuse (query_id, doc_id, rank) legs into
    (query_id, doc_id, rrf_micros[, rank]) — highest fused score
    first per query; ties break to the lowest doc_id."""
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranking leg")
    contribs = [
        leg.select(
            "query_id",
            "doc_id",
            # exact integer division (Spark DIV == DuckDB //); a
            # float divide + cast would round differently per engine
            F.expr(f"CAST(1000000 DIV ({k} + rank) AS BIGINT)").alias(
                "contrib"
            ),
        )
        for leg in legs
    ]
    fused = (
        reduce(DataFrame.unionAll, contribs)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("rrf_micros"))
    )
    if topk is None:
        return fused
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micros"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rrf_micros", "rank")
    )


def lexical_overlap_leg(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: list[int],
    depth: int = 20,
) -> DataFrame:
    """(query_id, doc_id, rank): lexical retrieval by distinct-token
    overlap with each query document. The query side is a tiny
    broadcast inverted index; the corpus explodes distinct terms once
    and joins by term — never a doc x doc product. Zero-overlap docs
    never rank (they cannot reach a truncated list)."""
    from frames_spark.functions import text as text_fns

    toks = F.array_distinct(text_fns.tokens(F.col(text_col)))
    qterms = (
        docs.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    dterms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
    ).filter(F.col("term") != "")
    overlap = (
        dterms.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("overlap"), F.asc("doc_id")
    )
    return (
        overlap.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select("query_id", "doc_id", "rank")
    )

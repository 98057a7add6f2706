"""Benchmark decontamination: which training documents share long
n-grams with an evaluation set.

The standard pre-release gate: any training doc containing enough of
a benchmark's n-grams is flagged (and usually dropped) so eval
scores aren't inflated by memorized test data.

Shape: both sides shingle into word n-grams (distinct per doc), then
ONE equi-join on the shingle — an inverted-index probe, never a doc
x doc comparison. The benchmark side is tiny (eval sets are
thousands of rows), so its shingle index BROADCASTS and the corpus
never shuffles: the whole check is a map-side join over the corpus
scan, O(corpus tokens) work. Flag threshold = distinct shared
n-grams, robust to single accidental collisions.

Frames ref: none; scale extension surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.jaccard import shingle_index


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc, bench_doc, n_shared): corpus docs sharing >= min_shared
    distinct word ``n``-grams with a benchmark doc."""
    corp = shingle_index(corpus, id_col, text_col, n)
    bench = shingle_index(benchmark, id_col, text_col, n).withColumnRenamed(
        "doc", "bench_doc"
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        corp.join(bench, "shingle")
        .groupBy("doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )

"""Eval-corpus preparation pipeline.

The benchmark-adjacent twin of pipelines/pretrain.py: before any
training run, held-out EVAL data must be (1) quality-gated, (2)
decontaminated against the benchmark suite (docs sharing n-gram
shingles with a benchmark doc leak test answers into training), (3)
split train/val by CONTENT HASH (an entity always lands in the same
split across runs and shards — no leakage, no drift), and (4)
chunked to the context window. One lazy DataFrame plan; every stage
reuses an already-oracled operator:

  quality gate   -> functions/text.py n_tokens (scan expression)
  decontaminate  -> dedup/contamination.py shingle inverted index
                    (benchmark side broadcast — a benchmark suite is
                    schema-bounded, unlike a corpus dim)
  split          -> operators/sampling.py train_test_split (md5
                    bucket, deterministic across engines/runs)
  chunk          -> pipelines/chunking.py chunk_text (sequence+slice
                    in the scan stage, no token explode)

Registered as q_pipeline_evalprep with a full nested-CTE SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.contamination import contaminated_docs
from frames_spark.functions import text as text_fns
from frames_spark.operators.sampling import train_test_split
from frames_spark.pipelines.chunking import chunk_text

__all__ = ["prepare_eval_corpus"]


def prepare_eval_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    shingle_n: int = 3,
    min_shared: int = 3,
    val_fraction: float = 0.1,
    max_tokens: int = 50,
    overlap: int = 10,
    seed: str = "split",
) -> DataFrame:
    """(id, split, chunk_idx, chunk_fp, n_chunk_tokens) for every
    surviving chunk; ``split`` is 'train' or 'val'."""
    gated = docs.filter(text_fns.n_tokens(F.col(text_col)) >= min_tokens)
    contam = contaminated_docs(
        gated, benchmark, id_col, text_col, n=shingle_n, min_shared=min_shared
    )
    clean = gated.join(
        contam.select(F.col("doc").alias(id_col)).distinct(), id_col, "left_anti"
    )
    split = train_test_split(
        clean, id_col, val_fraction, seed=seed, alias="split"
    ).withColumn(
        "split",
        F.when(F.col("split") == "test", F.lit("val")).otherwise(F.col("split")),
    )
    # chunk once over all survivors, carry the split back via the
    # (id -> split) relation (one equi-join, AQE-sized)
    chunks = chunk_text(split, id_col, text_col, max_tokens, overlap)
    labels = split.select(id_col, "split")
    return chunks.join(labels, id_col).select(
        id_col,
        "split",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5(F.col("chunk_text")).alias("chunk_fp"),
        "n_chunk_tokens",
    )

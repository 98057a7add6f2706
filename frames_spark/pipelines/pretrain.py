"""End-to-end training-corpus cleaning pipeline.

The composition a pretraining data pipeline actually runs, as ONE
lazy DataFrame plan (Catalyst fuses the filter stages into the scan;
the only shuffles are the four keyed aggregations/joins, each on a
uniform hash key):

  1. quality gate   — token count + punctuation ratio (pure scan
                      expressions, no shuffle);
  2. language gate  — stopword-hit language ID, keep target language
                      (one agg on doc id + semi-join);
  3. exact dedup    — md5 fingerprint, keep min doc id per group;
  4. near-dup drop  — MinHash+LSH candidate pairs on the surviving
                      corpus, greedily drop the higher doc id of each
                      pair (deterministic, single anti-join — no
                      iterative connected components);
  5. emit           — (doc_id, n_tokens) accounting columns.

Greedy pair-drop note: transitive chains (a~b, b~c, a!~c) keep only
``a`` where a component-wise dedup might keep ``a`` and ``c``; that
over-drop is the standard trade for avoiding an iterative algorithm
in the hot path.

Every stage is md5-based / integer-deterministic, so the whole
pipeline has an exact SQL oracle (queries.q_pipeline_clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.exact import exact_dedup
from frames_spark.dedup.minhash import lsh_candidate_pairs, minhash_signatures
from frames_spark.functions import text as text_fns
from frames_spark.functions.langid import predicted_lang
from frames_spark.operators.core import spread


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    lang: str = "en",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """The cleaned corpus: (id, n_tokens) for every surviving doc."""
    text = F.col(text_col)
    quality = spread(docs).filter(
        (text_fns.n_tokens(text) >= min_tokens)
        & (text_fns.punct_ratio(text) <= max_punct)
    )
    # language gate is a pure scan expression (functions/langid.py) —
    # fused with the quality filter into the scan, no join, no shuffle
    gated = quality.filter(predicted_lang(text) == lang)
    unique = exact_dedup(gated, id_col, text_col)
    pairs = lsh_candidate_pairs(
        minhash_signatures(unique, id_col, text_col, shingle_n, num_hashes),
        bands,
        rows_per_band,
    )
    near_dups = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = unique.join(near_dups, id_col, "left_anti")
    return kept.select(
        F.col(id_col),
        text_fns.n_tokens(text).cast("long").alias("n_tokens"),
    )

"""Streaming corpus cleaner — the Structured Streaming twin of
pipelines/pretrain.clean_corpus for continuously-arriving documents.

Stage mapping from the batch pipeline:

  1+2. quality + language gates — pure scan expressions
       (functions/text.py, functions/langid.py), identical code on a
       stream; no state, fused into each micro-batch's scan.
  3.   exact dedup — ``dropDuplicatesWithinWatermark`` keyed on the
       content fingerprint: state is O(docs per watermark window) and
       watermark-EVICTED, the only formulation that survives an
       unbounded stream. Semantics differ from batch keep-min in one
       way a stream cannot avoid: the FIRST-ARRIVED copy survives
       (a later lower-id duplicate is dropped), and duplicates
       separated by more than the watermark are NOT deduped — the
       batch compaction pass downstream remains the source of truth
       for full-history dedup.
  4.   near-dup (MinHash) is intentionally NOT streamed: candidate
       generation needs a corpus-wide shingle index, i.e. unbounded
       state growing with the corpus, which is exactly what streaming
       state must never do. Production shape: stream stages 1-3,
       run the near-dup pass as a periodic batch job over the
       accumulated cleaned table.

Frames ref: the streaming half of Frames' two execution modes
(src/Frames/CSV.hs pipes producers) — constant-memory traversal,
here with explicitly bounded dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.functions import text as text_fns
from frames_spark.functions.langid import predicted_lang


def clean_corpus_stream(
    docs: DataFrame,
    ts_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    lang: str = "en",
    watermark: str = "1 hour",
    redact_pii: bool = False,
) -> DataFrame:
    """Cleaned (id, n_tokens, ts) stream: gated, fingerprint-deduped
    within the watermark. ``docs`` must be a streaming DataFrame with
    an event-time column ``ts_col``."""
    if redact_pii:
        from frames_spark.functions.redact import redact

        docs = docs.withColumn(text_col, redact(F.col(text_col)))
    text = F.col(text_col)
    gated = docs.filter(
        (text_fns.n_tokens(text) >= min_tokens)
        & (text_fns.punct_ratio(text) <= max_punct)
        & (predicted_lang(text) == lang)
    ).select(
        F.col(id_col),
        F.col(ts_col),
        text_fns.n_tokens(text).cast("long").alias("n_tokens"),
        text_fns.fingerprint(text).alias("fp"),
    )
    deduped = gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
    return deduped.select(id_col, "n_tokens", ts_col)

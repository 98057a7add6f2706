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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    strip_html: bool = False,
    repetition_gates: bool = False,
) -> DataFrame:
    """Cleaned (id, n_tokens, ts) stream: gated, fingerprint-deduped
    within the watermark. ``docs`` must be a streaming DataFrame with
    an event-time column ``ts_col``. ``strip_html`` and
    ``repetition_gates`` mirror the batch pipeline's crawl-extraction
    and Gopher-battery stages — both are pure scan expressions, so
    the streaming twin keeps batch/stream parity for free."""
    if strip_html:
        from frames_spark.functions.html import html_to_text

        docs = docs.withColumn(text_col, html_to_text(F.col(text_col)))
    if redact_pii:
        from frames_spark.functions.redact import redact

        docs = docs.withColumn(text_col, redact(F.col(text_col)))
    text = F.col(text_col)
    gate = (
        (text_fns.n_tokens(text) >= min_tokens)
        & (text_fns.punct_ratio(text) <= max_punct)
        & (predicted_lang(text) == lang)
    )
    if repetition_gates:
        from frames_spark.functions.gopher import passes_repetition_gates

        gate = gate & passes_repetition_gates(
            text_fns.tokens(text), F.length(text_fns.normalize(text))
        )
    gated = docs.filter(gate).select(
        F.col(id_col),
        F.col(ts_col),
        text_fns.n_tokens(text).cast("long").alias("n_tokens"),
        text_fns.fingerprint(text).alias("fp"),
    )
    deduped = gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
    return deduped.select(id_col, "n_tokens", ts_col)


# ---------------------------------------------------------------------------
# Streaming NEAR-dup candidate pairs — closing the documented gap
# ("near-dup deliberately batch-only"): a watermark-horizon LSH
# index as per-bucket state.
# ---------------------------------------------------------------------------

PAIR_SCHEMA = "doc_a long, doc_b long, est_matches long"
_BUCKET_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
    ]
)


def _stream_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(band, band_key, doc, sigs) rows, built STATELESSLY: the
    per-doc MinHash signature is array_min over the in-array shingle
    hashes (bit-identical to the batch groupBy-min form — min over a
    multiset equals min over its set), so the only stateful operator
    in the stream is the bucket store itself. The shingle-hash array
    binds ONCE via a single-element transform (a let), not once per
    hash function."""
    from frames_spark.dedup.jaccard import shingles
    from frames_spark.dedup.minhash import MINHASH_P, _mix_consts
    from frames_spark.functions.hashing import hash60
    from frames_spark.functions.text import tokens

    sh = shingles(tokens(F.col(text_col)), n)
    bases = F.transform(sh, lambda s: hash60(s, seed="mh") % MINHASH_P)
    consts = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in (_mix_consts(i) for i in range(num_hashes))
        ]
    )
    sigs = F.get(
        F.transform(
            F.array(bases),
            lambda bs: F.transform(
                consts,
                lambda c: F.array_min(
                    F.transform(
                        bs, lambda x: (c["a"] * x + c["b"]) % MINHASH_P
                    )
                ),
            ),
        ),
        0,
    )
    with_sigs = docs.select(
        F.col(id_col).alias("doc"), sigs.alias("sigs")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(
                    F.transform(
                        F.slice("sigs", b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return with_sigs.select(
        "doc", "sigs", F.explode(band_structs).alias("bk")
    ).select(F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"), "doc", "sigs")


def near_dup_pairs_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    state_cap: int = 64,
) -> DataFrame:
    """Streaming MinHash-LSH candidate pairs: per (band, bucket) the
    state holds the last ``state_cap`` (doc, signature) entries; each
    arriving doc emits a pair per stored bucket-mate (signature
    agreement included so callers threshold downstream), then joins
    the store. Exactly-once per (bucket, doc) under redelivery — a
    doc already stored emits nothing again.

    State is O(buckets x state_cap), the streaming analog of
    lsh_candidate_pairs' max_bucket guard: a hot bucket (corpus-wide
    boilerplate) CAPS at state_cap instead of growing without bound —
    the documented recall/memory tradeoff; add a GroupStateTimeout to
    evict cold buckets at the watermark horizon in production. Pairs
    can repeat across BANDS (same as batch) — distinct downstream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    banded = _stream_signatures(
        docs, id_col, text_col, n, num_hashes, bands, rows_per_band
    )

    def update(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        sigs: list[list[int]] = []
        if state.exists:
            s_ids, s_sigs = state.get
            ids = list(s_ids or [])
            sigs = [list(x) for x in (s_sigs or [])]
        rows = []
        for pdf in pdfs:
            for doc, sig in sorted(
                zip(pdf["doc"], pdf["sigs"]), key=lambda t: t[0]
            ):
                doc = int(doc)
                sig = [int(x) for x in sig]
                if doc in ids:
                    continue
                for od, osig in zip(ids, sigs):
                    est = sum(a == b for a, b in zip(sig, osig))
                    rows.append(
                        (min(doc, od), max(doc, od), est)
                    )
                ids.append(doc)
                sigs.append(sig)
                if len(ids) > state_cap:
                    ids.pop(0)
                    sigs.pop(0)
        state.update((ids, sigs))
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_a", "doc_b", "est_matches"]
            )

    return banded.groupBy("band", "band_key").applyInPandasWithState(
        update,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming hard-negative miner — the Structured Streaming twin of
similarity/negatives.hard_negatives_lsh for continuously-arriving
labeled vectors (fresh embeddings landing from an encoder job,
mined against the recent corpus without a batch rebuild).

Stage mapping from the batch miner (similarity/negatives.py
_mined_topk_lsh):

  - the multi-table hyperplane LSH bucketing is STATELESS — the same
    shared sign-array pass (dedup/embedding.table_buckets), fused into
    each micro-batch's scan; one arriving vector explodes to
    num_tables (tbl, bucket) rows;
  - the bucket self-join becomes per-(tbl, bucket) STATE: the store
    holds the last ``state_cap`` (id, label, fvec, n2) entries; each
    arriving vector emits one scored candidate pair per stored
    bucket-mate under the label predicate, in BOTH anchor directions
    (the batch join produces both), then joins the store. A vector
    already stored emits nothing again — exactly-once per (bucket,
    id) under redelivery WHILE the id remains in state: once FIFO
    eviction at ``state_cap`` removes an id, a redelivered copy is
    indistinguishable from a new vector and re-emits its pairs. The
    downstream ``distinct`` (already required for cross-TABLE
    repeats) absorbs eviction-induced re-emission;
  - the exact fixed-point cosine runs inside the state update on the
    stored int64 vectors — float(dot) / (sqrt(n2a) * sqrt(n2b)), the
    identical IEEE expression to cosine_from_fixed, so streamed
    scores are bit-equal to the batch miner's;
  - top-k per anchor is NOT streamed: rank-k over an unbounded
    candidate stream is unbounded state per anchor. Production
    shape: stream emits scored candidates, a periodic batch pass (or
    the training-data writer itself) takes the per-anchor top-k —
    mirroring how near-dup streams candidates and batch-compacts.

State is O(buckets x state_cap), the streaming analog of the batch
``max_bucket`` guard: a hot bucket CAPS (FIFO eviction) instead of
growing without bound — the documented recall/memory tradeoff. Pairs
can repeat across TABLES (same as batch pre-distinct) — distinct
downstream. Zero vectors score None (the batch NULL-cosine
pass-through).

Frames ref: no streaming surface in the reference (its pipes mode is
single-pass batch); this module is §2b LLM-pipeline extension scope,
witnessed by tests/test_streaming_negatives.py two-batch parity
against the batch miner.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_spark.dedup.embedding import table_buckets
from frames_spark.functions.vectors import norm2_fixed, to_fixed

__all__ = ["hard_negative_candidates_stream"]

CAND_SCHEMA = "anchor_id long, cand_id long, cosine double"
_BUCKET_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("lbls", T.ArrayType(T.StringType())),
        T.StructField("vecs", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("n2s", T.ArrayType(T.LongType())),
    ]
)


def _banded_vectors(
    docs: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    num_planes: int,
    num_tables: int,
    dim: int,
) -> DataFrame:
    """(tbl, bucket, vid, lbl, fvec, n2) rows, built statelessly —
    the batch miner's banding stage verbatim: one sign pass computes
    every table's bucket."""
    base = docs.select(
        F.col(id_col).alias("vid"),
        to_fixed(F.col(vec_col)).alias("fvec"),
        F.col(label_col).cast("string").alias("lbl"),
    ).withColumn("n2", norm2_fixed(F.col("fvec")))
    tables = table_buckets(num_tables, num_planes, dim)
    return base.select(
        "vid", "lbl", "fvec", "n2", F.explode(tables).alias("b")
    ).select(
        F.col("b.tbl").alias("tbl"),
        F.col("b.bucket").alias("bucket"),
        "vid",
        "lbl",
        "fvec",
        "n2",
    )


def hard_negative_candidates_stream(
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    state_cap: int = 256,
    same_label: bool = False,
) -> DataFrame:
    """Streaming (anchor_id, cand_id, cosine) hard-candidate pairs:
    per (table, bucket) the state holds the last ``state_cap``
    (id, label, vector) entries; each arriving vector emits a scored
    pair per stored bucket-mate whose label satisfies the predicate
    (different label by default — negatives; ``same_label=True``
    mines positive candidates), in both anchor directions. Downstream
    takes the per-anchor top-k (see module docstring)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    banded = _banded_vectors(
        docs, id_col, vec_col, label_col, num_planes, num_tables, dim
    )

    def update(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        lbls: list[str] = []
        vecs: list[np.ndarray] = []
        n2s: list[int] = []
        if state.exists:
            s_ids, s_lbls, s_vecs, s_n2s = state.get
            ids = [int(x) for x in (s_ids or [])]
            lbls = list(s_lbls or [])
            vecs = [np.asarray(v, dtype=np.int64) for v in (s_vecs or [])]
            n2s = [int(x) for x in (s_n2s or [])]
        # Emit in bounded slices: a hot bucket at state_cap produces
        # O(state_cap) pairs PER arriving vector; holding a whole
        # micro-batch's pairs in one list is O(state_cap x batch)
        # worker memory. Flush whenever the buffer crosses the bound
        # and after every input chunk — output is identical (Spark
        # concatenates the yielded frames), peak memory is bounded.
        emit_bound = 1 << 15
        rows = []
        for pdf in pdfs:
            for vid, lbl, fvec, n2 in sorted(
                zip(pdf["vid"], pdf["lbl"], pdf["fvec"], pdf["n2"]),
                key=lambda t: t[0],
            ):
                vid = int(vid)
                fvec = np.asarray(fvec, dtype=np.int64)
                n2 = int(n2)
                if vid in ids:
                    continue
                for ovid, olbl, ovec, on2 in zip(ids, lbls, vecs, n2s):
                    if (lbl == olbl) != same_label:
                        continue
                    denom = math.sqrt(float(n2)) * math.sqrt(float(on2))
                    cos = (
                        float(int((fvec * ovec).sum())) / denom
                        if denom
                        else None
                    )
                    rows.append((vid, ovid, cos))
                    rows.append((ovid, vid, cos))
                ids.append(vid)
                lbls.append(str(lbl))
                vecs.append(fvec)
                n2s.append(n2)
                if len(ids) > state_cap:
                    ids.pop(0)
                    lbls.pop(0)
                    vecs.pop(0)
                    n2s.pop(0)
                if len(rows) >= emit_bound:
                    yield pd.DataFrame(
                        rows, columns=["anchor_id", "cand_id", "cosine"]
                    )
                    rows = []
            if rows:
                yield pd.DataFrame(
                    rows, columns=["anchor_id", "cand_id", "cosine"]
                )
                rows = []
        state.update(
            (ids, lbls, [[int(x) for x in v] for v in vecs], n2s)
        )

    return banded.groupBy("tbl", "bucket").applyInPandasWithState(
        update,
        outputStructType=CAND_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

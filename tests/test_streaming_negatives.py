"""Streaming hard-negative miner == the batch miner across a
two-batch delivery cut: the per-(table, bucket) state must pair a
vector arriving in batch 2 with a different-label mate stored in
batch 1, scores bit-equal to the batch exact fixed-point cosine."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from frames_spark.similarity.negatives import hard_negatives_lsh
from frames_spark.streaming.negatives import hard_negative_candidates_stream

K, PLANES, TABLES = 3, 4, 8


def _run_two_batches(spark, emb, tmp_path, **kwargs):
    """Deliver emb as two id-ordered halves (one file = one
    micro-batch), absorbing streamed candidates across both runs."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cut = emb.approxQuantile("vec_id", [0.5], 0.0)[0]
    got: set = set()

    def absorb(batch_df, _bid):
        for r in batch_df.collect():
            got.add((r["anchor_id"], r["cand_id"], r["cosine"]))

    for half in (
        emb.filter(F.col("vec_id") <= cut),
        emb.filter(F.col("vec_id") > cut),
    ):
        half.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(emb.schema).parquet(src)
        q = (
            hard_negative_candidates_stream(
                stream, "vec_id", "embedding", "label",
                num_planes=PLANES, num_tables=TABLES,
                state_cap=10_000, **kwargs,
            )
            .writeStream.outputMode("update")
            .foreachBatch(absorb)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return got


def test_streamed_candidates_topk_equals_batch_miner(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    want = {
        (r["anchor_id"], r["neg_id"], r["cosine"], r["rank"])
        for r in hard_negatives_lsh(
            emb, "vec_id", "embedding", "label", k=K,
            num_planes=PLANES, num_tables=TABLES,
            max_bucket=10_000, guard="off",
        ).collect()
    }

    cands = _run_two_batches(spark, emb, tmp_path)
    assert cands
    # downstream top-k: the batch miner's exact rule (cosine desc,
    # cand_id asc) over the deduped streamed candidate set
    per_anchor = defaultdict(set)
    for a, c, cos in cands:
        per_anchor[a].add((c, cos))
    got = set()
    for a, cs in per_anchor.items():
        ranked = sorted(cs, key=lambda t: (-t[1], t[0]))[:K]
        for i, (c, cos) in enumerate(ranked, 1):
            got.add((a, c, cos, i))
    assert got == want


def test_redelivered_batch_emits_nothing_new(spark, sf_dir, tmp_path):
    """A vector already stored in its bucket emits no pairs again —
    exactly-once per (bucket, id) under redelivery."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    seen: list = []

    def absorb(batch_df, _bid):
        seen.append({tuple(r) for r in batch_df.collect()})

    for _ in range(2):  # same rows delivered twice
        emb.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(emb.schema).parquet(src)
        q = (
            hard_negative_candidates_stream(
                stream, "vec_id", "embedding", "label",
                num_planes=PLANES, num_tables=TABLES, state_cap=10_000,
            )
            .writeStream.outputMode("update")
            .foreachBatch(absorb)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    first = set().union(*seen[:1]) if seen else set()
    redelivered = set().union(*seen[1:]) if len(seen) > 1 else set()
    assert first and not redelivered


def test_same_label_mode_mines_positive_candidates(spark, sf_dir, tmp_path):
    """same_label=True emits only same-label pairs (the positive-
    mining direction); every emitted pair must agree on label."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 80
    )
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    cands = _run_two_batches(
        spark, emb, tmp_path, same_label=True
    )
    assert cands
    assert all(labels[a] == labels[c] for a, c, _ in cands)

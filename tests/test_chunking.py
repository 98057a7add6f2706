"""Chunking coverage/overlap invariants, packing capacity invariants,
decontamination flags planted copies."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.dedup.contamination import contaminated_docs
from frames_spark.pipelines.chunking import chunk_text, pack_docs
from frames_spark.sources.tables import load_table


def test_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    chunks = chunk_text(df, max_tokens=30, overlap=10).collect()
    # stride 20: starts at 0,20,40,60,80 -> 5 chunks
    assert [c.chunk_idx for c in sorted(chunks, key=lambda c: c.chunk_idx)] == list(range(5))
    toks = set()
    for c in chunks:
        toks.update(c.chunk_text.split(" "))
    assert toks == {f"t{i}" for i in range(100)}  # full coverage
    first, second = sorted(chunks, key=lambda c: c.chunk_idx)[:2]
    overlap = set(first.chunk_text.split()) & set(second.chunk_text.split())
    assert len(overlap) == 10


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], "doc_id: long, text: string"
    )
    chunks = chunk_text(df, max_tokens=50, overlap=10).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert len(by_doc.get(1, [])) == 1
    assert by_doc[1][0].n_chunk_tokens == 3
    # empty text tokenizes to [''] (string_split semantics, matched
    # by the SQL twin) -> one degenerate chunk; a pipeline drops
    # these at the quality gate (n_tokens >= min), not here
    assert len(by_doc.get(2, [])) == 1
    assert by_doc[2][0].chunk_text == ""


def test_pack_docs_capacity_and_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from frames_spark.functions.text import tokens

    wt = docs.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    packed = pack_docs(wt, "source", "doc_id", "n_tokens", capacity=500)
    rows = sorted(
        ((r.source, r.doc_id, r.n_tokens, r.bin, r.bin_offset) for r in packed.collect())
    )
    # replay the packing per source: exclusive prefix over doc_id order
    prefix: dict = {}
    for source, doc_id, n, b, off in rows:
        p = prefix.get(source, 0)
        assert b == p // 500 and off == p % 500, (source, doc_id)
        prefix[source] = p + n
    # bins are dense from 0 per source
    from collections import defaultdict
    bins = defaultdict(set)
    for source, _, _, b, _ in rows:
        bins[source].add(b)
    for source, bs in bins.items():
        assert bs == set(range(max(bs) + 1))


def test_decontamination_flags_planted_copy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    bench = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    flagged = contaminated_docs(docs, bench, n=3, min_shared=3)
    hits = {(r.doc, r.bench_doc) for r in flagged.collect()}
    # every benchmark doc flags its source (identical text)
    for d in range(5):
        assert (d, d + 100000) in hits

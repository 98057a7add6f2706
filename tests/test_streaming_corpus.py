"""Streaming corpus cleaner == batch gates, with redeliveries dropped.

The doc stream is the documents table delivered TWICE (two files =
two micro-batches); the cleaned stream must equal the batch
quality+language gate output exactly — every doc once, none of the
redelivered copies surviving the fingerprint dedup state.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from frames_spark.functions import text as text_fns
from frames_spark.functions.langid import predicted_lang
from frames_spark.sources.tables import load_table
from frames_spark.streaming.corpus import clean_corpus_stream
from frames_spark.streaming.events import run_to_memory


def test_streaming_clean_matches_batch_gates(spark, sf_dir, tmp_path):
    src = tmp_path / "doc_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "docs_a.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", src / "docs_redelivered.parquet")

    physical = spark.read.parquet(str(src / "docs_a.parquet")).schema
    raw = (
        spark.readStream.schema(physical)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    # deterministic synthetic event time: doc_id seconds past an
    # arbitrary base (doc 0 exactly AT epoch 0 == the initial
    # watermark would be dropped as late)
    stream = raw.withColumn(
        "ingest_ts", F.timestamp_seconds(F.col("doc_id") + 1_000_000)
    )
    cleaned = clean_corpus_stream(stream, "ingest_ts", min_tokens=10,
                                  max_punct=0.2, lang="en")
    got = {
        (r.doc_id, r.n_tokens)
        for r in run_to_memory(cleaned, "clean_stream", output_mode="append")
        .collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    want = {
        (r.doc_id, r.n_tokens)
        for r in docs.filter(
            (text_fns.n_tokens(text) >= 10)
            & (text_fns.punct_ratio(text) <= 0.2)
            & (predicted_lang(text) == "en")
        )
        .select("doc_id", text_fns.n_tokens(text).cast("long").alias("n_tokens"))
        .collect()
    }
    assert got == want
    assert len(got) > 0

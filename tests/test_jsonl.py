"""JSONL ingest (sources/jsonl.py): bounded inference, typed read,
permissive corrupt capture, nested flatten, roundtrip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_spark.sources.jsonl import (
    flatten_struct,
    infer_jsonl_schema,
    read_jsonl,
    validate_jsonl,
    write_jsonl,
)


@pytest.fixture
def corpus(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world", "score": 0.5,
         "meta": {"lang": "en", "tokens": 2}, "tags": ["a", "b"]},
        {"doc_id": 2, "text": "bonjour", "score": 1.0,
         "meta": {"lang": "fr", "tokens": 1}, "tags": []},
        {"doc_id": 3, "text": "null score", "score": None,
         "meta": {"lang": "en", "tokens": 2}, "tags": ["c"]},
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(2, "{this is not json")  # corrupt line
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_inference_bounded_and_typed(spark, corpus):
    schema = infer_jsonl_schema(spark, corpus, sample_rows=100)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert isinstance(by_name["doc_id"], T.LongType)
    assert isinstance(by_name["score"], T.DoubleType)
    assert isinstance(by_name["meta"], T.StructType)
    assert isinstance(by_name["tags"], T.ArrayType)


def test_permissive_keeps_corrupt(spark, corpus):
    df = read_jsonl(spark, corpus).cache()
    assert df.count() == 4
    health = validate_jsonl(df)
    assert health == {"total": 4, "corrupt": 1}
    good = df.filter(F.col("_corrupt_record").isNull())
    assert sorted(r["doc_id"] for r in good.select("doc_id").collect()) == [1, 2, 3]


def test_dropmalformed_skips(spark, corpus):
    df = read_jsonl(spark, corpus, permissive=False)
    assert sorted(r["doc_id"] for r in df.select("doc_id").collect()) == [1, 2, 3]


def test_flatten_and_column_pruning(spark, corpus):
    df = read_jsonl(spark, corpus, columns=["doc_id", "meta"])
    flat = flatten_struct(df, "meta")
    assert set(flat.columns) == {"doc_id", "meta_lang", "meta_tokens"}
    langs = {r["doc_id"]: r["meta_lang"] for r in flat.collect() if r["doc_id"]}
    assert langs == {1: "en", 2: "fr", 3: "en"}
    with pytest.raises(ValueError):
        flatten_struct(df, "doc_id")


def test_roundtrip(spark, corpus, tmp_path):
    df = read_jsonl(spark, corpus, permissive=False).select(
        "doc_id", "text", "score"
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, permissive=False)
    want = {(r["doc_id"], r["text"], r["score"]) for r in df.collect()}
    got = {(r["doc_id"], r["text"], r["score"]) for r in back.collect()}
    assert got == want

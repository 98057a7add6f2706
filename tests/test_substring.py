"""Substring-level exact dedup (dedup/substring.py): Lee et al. 2022
ExactSubstr semantics at fixed n-gram granularity — every non-first
occurrence of a corpus-wide repeated span is excised, the global
first occurrence survives."""

from __future__ import annotations

import pyspark.sql.functions as F

from frames_spark.dedup.substring import excise_repeated_ngrams


def _run(spark, rows, n=8):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in excise_repeated_ngrams(docs, "doc_id", "text", n=n).collect()
    }


def test_cross_doc_repeat_keeps_first_occurrence(spark):
    shared = "a b c d e f g h"
    got = _run(
        spark,
        [
            (1, f"{shared} x y z"),
            (2, f"p q {shared} r"),
            (3, "totally unique words with no repeats at all ok"),
            (4, "short doc"),
        ],
    )
    # doc 1 holds the global first occurrence: untouched
    assert got[1]["clean_text"] == "a b c d e f g h x y z"
    assert got[1]["n_removed"] == 0
    # doc 2's occurrence is excised, surrounding tokens survive
    assert got[2]["clean_text"] == "p q r"
    assert got[2]["n_removed"] == 8
    assert got[2]["n_tokens"] == 11
    # unique doc and sub-n doc pass through
    assert got[3]["n_removed"] == 0
    assert got[4]["clean_text"] == "short doc" and got[4]["n_removed"] == 0


def test_within_doc_repeat_excises_second_copy(spark):
    span = "m1 m2 m3 m4 m5 m6 m7 m8"
    got = _run(spark, [(7, f"{span} Z {span}")])
    assert got[7]["clean_text"] == f"{span} Z"
    assert got[7]["n_removed"] == 8


def test_long_repeated_passage_excises_as_one_interval(spark):
    """A repeated passage LONGER than n produces overlapping repeated
    n-grams whose covered intervals merge into the whole passage."""
    passage = " ".join(f"w{i}" for i in range(12))  # 12 tokens > n=8
    got = _run(spark, [(1, f"{passage} tail1"), (2, f"head2 {passage} tail2")])
    assert got[1]["n_removed"] == 0
    assert got[2]["clean_text"] == "head2 tail2"
    assert got[2]["n_removed"] == 12


def test_min_count_threshold(spark):
    span = "a b c d e f g h"
    rows = [(1, f"{span} one"), (2, f"{span} two")]
    # min_count=3: a twice-repeated span is below threshold — kept
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in excise_repeated_ngrams(
            docs, "doc_id", "text", n=8, min_count=3
        ).collect()
    }
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_pipeline_excise_stage(spark, sf_dir):
    """clean_corpus(excise_repeats=8) rewrites text before the gates:
    runs end-to-end on the documents table and never keeps MORE
    tokens than the un-excised pipeline."""
    from frames_spark.pipelines.pretrain import clean_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = clean_corpus(docs, persist=False)
    excised = clean_corpus(docs, persist=False, excise_repeats=8)
    t_base = base.agg(F.sum("n_tokens")).collect()[0][0]
    t_exc = excised.agg(F.sum("n_tokens")).collect()[0][0]
    assert excised.count() > 0
    assert t_exc <= t_base


def test_string_doc_ids_work_and_survive(spark):
    # regression: the former id*1e6+pos packing cast non-numeric ids
    # to NULL — no spans detected, id column NULLed. struct-min keys
    # must detect the repeat and return the original ids untouched.
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [("doc-a", f"{shared} x y z"), ("doc-b", f"p q {shared} r")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in excise_repeated_ngrams(docs, "doc_id", "text", n=8).collect()
    }
    assert set(got) == {"doc-a", "doc-b"}
    # lexicographic struct-min: doc-a holds the first occurrence
    assert got["doc-a"]["n_removed"] == 0
    assert got["doc-b"]["clean_text"] == "p q r"
    assert got["doc-b"]["n_removed"] == 8

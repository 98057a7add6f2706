"""Degenerate-input hardening: empty frames, absent categories,
k > n, zero overlap — the cases ANSI mode or window semantics
turn into runtime errors when unguarded."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from frames_spark.operators.funnel import funnel_counts
from frames_spark.operators.rangejoin import interval_concurrency
from frames_spark.operators.sampling import weighted_sample
from frames_spark.pipelines.chunking import chunk_text, pack_docs


def test_concurrency_empty_input(spark):
    df = spark.createDataFrame([], "s: timestamp, e: timestamp")
    assert interval_concurrency(df, "s", "e").count() == 0


def test_funnel_step_absent_from_data(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view")],
        "user_id: long, ts: timestamp, event_type: string",
    )
    rows = {r.step: r.n_users for r in funnel_counts(
        ev, ["view", "click", "purchase"]).collect()}
    assert rows == {"view": 1, "click": 0, "purchase": 0}


def test_weighted_sample_k_exceeds_population(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "id: long, w: long")
    assert weighted_sample(df, "id", "w", k=100).count() == 2


def test_weighted_sample_all_zero_weights(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "id: long, w: long")
    assert weighted_sample(df, "id", "w", k=5).count() == 0


def test_chunk_zero_overlap_partitions_exactly(spark):
    text = " ".join(f"t{i}" for i in range(90))
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    chunks = chunk_text(df, max_tokens=30, overlap=0).collect()
    assert sorted(c.n_chunk_tokens for c in chunks) == [30, 30, 30]
    seen = [t for c in sorted(chunks, key=lambda c: c.chunk_idx)
            for t in c.chunk_text.split()]
    assert seen == [f"t{i}" for i in range(90)]  # disjoint, ordered


def test_pack_single_oversized_doc(spark):
    # a doc larger than capacity still gets a bin (its own)
    df = spark.createDataFrame(
        [("s", 1, 5000), ("s", 2, 10)], "source: string, doc_id: long, n_tokens: long"
    )
    rows = {r.doc_id: (r.bin, r.bin_offset) for r in pack_docs(
        df, "source", "doc_id", "n_tokens", capacity=2048).collect()}
    assert rows[1] == (0, 0)
    assert rows[2] == (2, 5000 % 2048)  # next doc lands after the giant


def test_qgram_edit_pairs_exact_recall_vs_bruteforce(spark):
    """Prefix-filter candidate generation must be lossless: compare
    against brute-force levenshtein over a small random-ish corpus."""
    import hashlib
    import itertools

    from frames_spark.dedup.editdist import qgram_edit_pairs

    base = [hashlib.md5(f"qg{i}".encode()).hexdigest()[:12] for i in range(60)]
    corpus = set(base)
    corpus.update(s[:4] + s[5:] for s in base)          # 1 deletion
    corpus.update(s[:2] + s[3:7] + s[8:] for s in base)  # 2 deletions
    strings = sorted(corpus)

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(strings, 2)
        if lev(a, b) <= 2
    }
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r.a, r.b, r.lev) for r in qgram_edit_pairs(df, "s", k=2).collect()}
    assert got == want
    assert len(got) > 0


def test_qgram_edit_pairs_short_strings_exact_fallback(spark):
    """r7 advice counter-example: k=2, q=3 — 'abcd' vs 'efcd' are lev 2
    with ZERO shared q-grams, so the prefix filter alone misses them.
    The k-deletion-neighborhood fallback (short_strings='exact', the
    default) must recover every short pair; 'drop' restores the old
    prefix-only behavior."""
    import itertools

    from frames_spark.dedup.editdist import qgram_edit_pairs

    # mixed corpus: the advice pair, more sub-q*(k+1) strings, strings
    # below q, and long strings whose pairs ride the main path
    strings = sorted(
        {
            "abcd", "efcd", "ab", "ax", "abcdefg", "abcdxfg", "abcdefgz",
            "kl", "klm", "k",
            "longenoughstring", "longenoughstrong", "longenoughstri",
        }
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(strings, 2)
        if lev(a, b) <= 2
    }
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r.a, r.b, r.lev) for r in qgram_edit_pairs(df, "s", k=2).collect()}
    assert got == want
    assert ("abcd", "efcd", 2) in got
    # 'drop' mode misses the advice pair (documented lossy behavior)
    dropped = {
        (r.a, r.b)
        for r in qgram_edit_pairs(df, "s", k=2, short_strings="drop").collect()
    }
    assert ("abcd", "efcd") not in dropped

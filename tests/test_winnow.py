"""Winnowing (functions/winnow.py): the paper's guarantee and
density bound, tie rule, short-doc edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.functions import winnow


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", winnow.winnow_fingerprints(F.col("text")).alias("fps")
    ).collect()
    return {r.doc_id: set(r.fps) for r in rows}


def test_shared_substring_guarantee(spark):
    # any shared run of >= w + n - 1 = 6 tokens must share a
    # fingerprint (SIGMOD'03 Theorem: the window over that run selects
    # the same local minimum in both documents)
    core = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    a = "xx yy " + core + " qq"
    b = "uu " + core + " vv ww"
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1]


def test_density_bound(spark):
    # expected density 2/(w+1) = 0.4; assert a loose band over a
    # long document
    text = " ".join(f"w{i * 7919 % 1000}" for i in range(500))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = df.select(
        F.size(winnow.gram_hashes(F.col("text"))).alias("ng"),
        F.size(winnow.winnow_keys(F.col("text"))).alias("nf"),
    ).first()
    density = r.nf / r.ng
    assert 0.2 < density < 0.6


def test_short_and_empty_docs(spark):
    fps = _fps(spark, ["", "one", "one two", "one two three"])
    assert fps[0] == set() and fps[1] == set() and fps[2] == set()
    assert len(fps[3]) == 1  # single gram -> single fingerprint


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(spark, ["aa bb cc dd ee ff gg", "qq rr ss tt uu vv ww"])
    assert not (fps[0] & fps[1])


def test_rows_form_matches_column_form(spark, sf_dir):
    """winnow_keys_rows (the O(G*w) sliding-frame form the queries
    use) must select EXACTLY the keys of the array-expression form."""
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    rows = {
        (r.doc_id, r.key)
        for r in winnow.winnow_keys_rows(docs, "doc_id", "text").collect()
    }
    cols = set()
    for r in docs.select(
        "doc_id", winnow.winnow_keys(F.col("text")).alias("ks")
    ).collect():
        cols.update((r.doc_id, k) for k in r.ks)
    assert rows == cols
    assert rows  # non-degenerate corpus

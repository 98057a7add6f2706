"""RRF fusion (similarity/fusion.py): rank math, truncation, and
leg-agreement behavior."""

from __future__ import annotations

from frames_spark.similarity import fusion


def _leg(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )


def test_rrf_exact_integer_contributions(spark):
    a = _leg(spark, [(1, 10, 1), (1, 11, 2)])
    b = _leg(spark, [(1, 10, 1), (1, 12, 2)])
    got = {
        r.doc_id: r.rrf_micros
        for r in fusion.rrf_fuse([a, b], k=60, topk=None).collect()
    }
    # doc 10 tops both legs: 2 * (1000000 DIV 61)
    assert got[10] == 2 * (1_000_000 // 61)
    assert got[11] == 1_000_000 // 62
    assert got[12] == 1_000_000 // 62


def test_rrf_consensus_beats_single_leg_first(spark):
    # doc 20 is rank 2 in BOTH legs; docs 21/22 are rank 1 in one leg
    # only. 2/(60+2) > 1/(60+1) -> consensus wins.
    a = _leg(spark, [(1, 21, 1), (1, 20, 2)])
    b = _leg(spark, [(1, 22, 1), (1, 20, 2)])
    top = fusion.rrf_fuse([a, b], k=60, topk=1).collect()
    assert len(top) == 1 and top[0].doc_id == 20


def test_rrf_topk_truncates_per_query_with_ties_to_low_id(spark):
    a = _leg(spark, [(1, d, r + 1) for r, d in enumerate([5, 6, 7])]
             + [(2, d, r + 1) for r, d in enumerate([8, 9])])
    fused = fusion.rrf_fuse([a], k=60, topk=2).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert sorted(by_q[1]) == [(1, 5), (2, 6)]
    assert sorted(by_q[2]) == [(1, 8), (2, 9)]


def test_lexical_leg_excludes_self_and_ranks_overlap(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma delta"),  # overlap 3 with q0
        (2, "alpha beta"),              # overlap 2
        (3, "zz yy"),                   # overlap 0 -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    leg = fusion.lexical_overlap_leg(docs, "doc_id", "text", [0], depth=10)
    got = {(r.doc_id): r.rank for r in leg.collect()}
    assert 0 not in got  # self excluded
    assert got[1] == 1 and got[2] == 2
    assert 3 not in got

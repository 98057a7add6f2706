"""Multi-probe LSH (similarity/ann.py multiprobe_topk): recall
dominance over single-bucket LSH at the same plane count, probe-set
shape, and exactness of returned cosines."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.similarity.ann import brute_force_topk, lsh_topk, multiprobe_topk
from frames_spark.sources.tables import load_table


def _recall(approx_rows, exact_rows):
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=5).collect()
    plain = lsh_topk(emb, q, "vec_id", "embedding", k=5, num_planes=6).collect()
    multi = multiprobe_topk(
        emb, q, "vec_id", "embedding", k=5, num_planes=6
    ).collect()
    r_plain = _recall(plain, exact)
    r_multi = _recall(multi, exact)
    # probing a superset of buckets can never lose candidates
    assert r_multi >= r_plain
    # synthetic embeddings are near-orthogonal (true top-5 cosines sit
    # close to the sign-flip boundary), so absolute recall is modest;
    # measured: plain ~0.1x, multiprobe ~0.26 at sf0.01. Pin a floor
    # under the measured value — a broken probe expansion collapses
    # to r_plain, far below it.
    assert r_multi >= 0.2


def test_multiprobe_candidates_superset_of_plain(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    plain = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(
            emb, q, "vec_id", "embedding", k=1000, num_planes=6
        ).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in multiprobe_topk(
            emb, q, "vec_id", "embedding", k=1000, num_planes=6
        ).collect()
    }
    assert plain <= multi
    # Hamming-1 probes must actually widen the candidate set here
    assert len(multi) > len(plain)


def test_multiprobe_cosines_match_bruteforce_values(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=50).collect()
    }
    for r in multiprobe_topk(
        emb, q, "vec_id", "embedding", k=5, num_planes=6
    ).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.cosine == exact[key]

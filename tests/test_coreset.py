"""k-center coreset (similarity/coreset.py): greedy invariants,
differential check vs a plain numpy reference, assignment."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from frames_spark.similarity import coreset
from frames_spark.sources.tables import load_table


def _numpy_reference(vecs: dict[int, np.ndarray], k: int):
    """Straight-line greedy farthest-point on fixed-point integers."""
    ids = sorted(vecs)
    fixed = {i: np.floor(vecs[i].astype(np.float64) * (1 << 20) + 0.5).astype(
        np.int64
    ) for i in ids}
    seed = ids[0]
    trace = [(0, seed, 0)]
    centers = [fixed[seed]]
    for rnd in range(1, k):
        best = None
        for i in ids:
            mind = min(int(((fixed[i] - c) ** 2).sum()) for c in centers)
            if best is None or mind > best[1] or (
                mind == best[1] and i < best[0]
            ):
                best = (i, mind)
        trace.append((rnd, best[0], best[1]))
        centers.append(fixed[best[0]])
    return trace


def test_trace_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    got = coreset.kcenter_select(emb, "vec_id", "embedding", k=6)
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in emb.collect()
    }
    assert got == _numpy_reference(vecs, 6)


def test_farthest_distances_nonincreasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    trace = coreset.kcenter_select(emb, "vec_id", "embedding", k=8)
    dists = [d for _, _, d in trace[1:]]
    # the greedy max-min radius never increases (Gonzalez invariant)
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    # selected ids are distinct
    ids = [i for _, i, _ in trace]
    assert len(set(ids)) == len(ids)


def test_assignment_covers_corpus_and_respects_nearest(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    fixed_rows = {
        r.vec_id: [int(np.floor(float(x) * (1 << 20) + 0.5)) for x in r.embedding]
        for r in emb.collect()
    }
    trace = coreset.kcenter_select(emb, "vec_id", "embedding", k=4)
    centers = [fixed_rows[i] for _, i, _ in trace]
    assigned = coreset.assign_to_centers(emb, "vec_id", "embedding", centers)
    rows = assigned.collect()
    assert len(rows) == emb.count()
    # spot-check nearest semantics on a few rows
    for r in rows[:10]:
        v = np.array(fixed_rows[r.vec_id], dtype=np.int64)
        d2s = [int(((v - np.array(c, dtype=np.int64)) ** 2).sum()) for c in centers]
        best = min(range(len(centers)), key=lambda j: (d2s[j], j))
        assert (r.center_idx, r.dist2) == (best, d2s[best])
    # selected centers sit at distance 0 of themselves
    zero = {r.vec_id for r in rows if r.dist2 == 0}
    assert {i for _, i, _ in trace} <= zero

"""Product quantization (similarity/pq.py): recall against the exact
search, deterministic codes under any layout, and the compression
contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from frames_spark.similarity.ann import brute_force_topk
from frames_spark.similarity.pq import encode_pq, fit_pq, pq_topk


def _setup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = fit_pq(emb, "vec_id", "embedding", m=16, k=32)
    return emb, cb


def test_pq_rerank_recall(spark, sf_dir):
    emb, cb = _setup(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3)
    codes = encode_pq(emb, "vec_id", "embedding", cb)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            codes, cb, q, "vec_id", "embedding", k=10, corpus=emb, rerank=100
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall


def test_pq_codes_layout_invariant(spark, sf_dir):
    emb, cb = _setup(spark, sf_dir)
    c1 = {
        r["vec_id"]: tuple(r["codes"])
        for r in encode_pq(emb, "vec_id", "embedding", cb).collect()
    }
    c2 = {
        r["vec_id"]: tuple(r["codes"])
        for r in encode_pq(
            emb.repartition(13), "vec_id", "embedding", cb
        ).collect()
    }
    assert c1 == c2
    # compression contract: 64 floats -> 16 small ints
    assert all(len(v) == 16 for v in c1.values())
    assert all(0 <= c < 32 for v in c1.values() for c in v)


def test_pq_fit_deterministic(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb1 = fit_pq(emb, "vec_id", "embedding", m=8, k=16)
    cb2 = fit_pq(emb.repartition(7), "vec_id", "embedding", m=8, k=16)
    np.testing.assert_array_equal(cb1, cb2)


def test_pq_adc_only_path(spark, sf_dir):
    """Without rerank the ADC order itself must be sane: the exact
    nearest neighbor set should overlap the shortlist far above
    chance."""
    emb, cb = _setup(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3)
    codes = encode_pq(emb, "vec_id", "embedding", cb)
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(codes, cb, q, "vec_id", "embedding", k=10).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }
    assert len(adc & exact) / len(exact) >= 0.2


def test_pq_save_load_roundtrip(spark, sf_dir, tmp_path):
    """A reloaded index answers identically to the in-memory one —
    the persistence contract (codes are the stored representation;
    codebooks round-trip through engine-readable parquet)."""
    import numpy as np

    from frames_spark.similarity.pq import load_pq, save_pq

    emb, cb = _setup(spark, sf_dir)
    codes = encode_pq(emb, "vec_id", "embedding", cb)
    save_pq(codes, cb, str(tmp_path / "pqidx"))
    codes2, cb2 = load_pq(spark, str(tmp_path / "pqidx"))
    np.testing.assert_array_equal(cb, cb2)
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(
        tuple(r)
        for r in pq_topk(
            codes, cb, q, "vec_id", "embedding", k=10, corpus=emb, rerank=50
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in pq_topk(
            codes2, cb2, q, "vec_id", "embedding", k=10, corpus=emb, rerank=50
        ).collect()
    )
    assert a == b


def test_ivfpq_recall_and_fullprobe(spark, sf_dir):
    """IVF-ADC: recall floor at nprobe=3, monotone in nprobe; and
    with EVERY cell probed and the shortlist covering the corpus the
    exact re-rank must equal brute force bit-for-bit (the recall
    budget is exactly {cells pruned} + {shortlist depth} — nothing
    else loses candidates)."""
    from frames_spark.similarity.pq import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }

    def got(nprobe, rerank=100):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                emb, q, "vec_id", "embedding", k=10,
                n_centroids=8, nprobe=nprobe, rerank=rerank,
            ).collect()
        }

    r3 = len(got(3) & exact) / len(exact)
    r8 = len(got(8) & exact) / len(exact)
    assert r3 >= 0.5, r3
    assert r8 >= r3
    # exhaustive setting == exact search, exactly
    assert got(8, rerank=10_000) == exact


def test_ivfpq_codes_partitioned_on_save(spark, sf_dir, tmp_path):
    """IVF-ADC codes save partitioned by cell: probing nprobe cells
    is a DIRECTORY prune on disk (PartitionFilters), same contract
    as the IVF index."""
    import os

    from frames_spark.plans.explain import formatted_plan
    from frames_spark.similarity.ivf import build_ivf
    from frames_spark.similarity.pq import (
        _unit,
        encode_pq,
        fit_pq,
        save_pq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "_nv", _unit(F.col("embedding"))
    )
    assigned, centroids = build_ivf(emb, "vec_id", "_nv", n_centroids=4)
    with_res = assigned.join(
        F.broadcast(centroids), "centroid_id"
    ).withColumn("_res", F.zip_with("_nv", "cvec", lambda a, b: a - b))
    cb = fit_pq(with_res, "vec_id", "_res", m=8, k=16, normalize=False)
    codes = encode_pq(
        with_res, "vec_id", "_res", cb, normalize=False,
        carry_cols=("centroid_id",),
    )
    save_pq(codes, cb, str(tmp_path / "idx"))
    root = str(tmp_path / "idx" / "codes")
    cells = [d for d in os.listdir(root) if d.startswith("centroid_id=")]
    assert len(cells) == 4
    probe = spark.read.parquet(root).filter(F.col("centroid_id").isin(0, 1))
    plan = formatted_plan(probe)
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1][:200]
    assert probe.count() > 0


def test_zero_vector_corpus_row_not_rank_one(spark, sf_dir):
    """A zero vector encodes to NULL codes -> NULL approx_dist; with
    default ASC (NULLS FIRST) ordering it would take rank 1 in EVERY
    query's ADC shortlist. nulls_last ordering keeps it out of the
    no-rerank top-k."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(999999, [0.0] * dim, "z")], "vec_id long, embedding array<double>, label string"
    )
    corpus = emb.unionByName(zero)
    cb = fit_pq(emb, "vec_id", "embedding", m=16, k=32)
    codes = encode_pq(corpus, "vec_id", "embedding", cb)
    q = emb.filter(F.col("vec_id") < 3)
    top = pq_topk(codes, cb, q, "vec_id", "embedding", k=10).collect()
    assert top, "no results"
    assert all(r["neighbor_id"] != 999999 for r in top)
    assert all(r["approx_dist"] is not None for r in top)


def test_ivfpq_det_residual_profile(spark, sf_dir):
    """Deterministic residual tier (r10 verdict #6): the codebook is
    int64 in the fixed-point RESIDUAL domain and differs from the
    raw-vector tier's; codes actually change; and the exhaustive
    setting (every cell probed, shortlist covering the corpus) equals
    brute force bit-for-bit — pruning and shortlist depth remain the
    only recall losses, residual encoding adds none."""
    import numpy as np

    from frames_spark.similarity.pq import (
        encode_pq_residual,
        fit_pq_det,
        ivfpq_topk_det,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)

    books_q = fit_pq_det(
        emb, "vec_id", "embedding", m=16, k=32, residual_cells=8
    )
    assert books_q.dtype == np.int64 and books_q.shape == (16, 32, 4)
    raw = fit_pq_det(emb, "vec_id", "embedding", m=16, k=32)
    raw_q = np.floor(raw * (1 << 20) + 0.5).astype(np.int64)
    assert (raw_q != books_q).any()  # residual subtraction is real

    rcodes = {
        r["vec_id"]: list(r["codes"])
        for r in encode_pq_residual(
            emb, "vec_id", "embedding", books_q, 8
        ).collect()
    }
    xcodes = {
        r["vec_id"]: list(r["codes"])
        for r in encode_pq(
            emb, "vec_id", "embedding", raw, normalize=False
        ).collect()
    }
    assert set(rcodes) == set(xcodes)
    assert any(rcodes[v] != xcodes[v] for v in rcodes)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }

    def got(nprobe, rerank):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk_det(
                emb, q, "vec_id", "embedding", k=10,
                n_centroids=8, nprobe=nprobe, rerank=rerank,
            ).collect()
        }

    assert got(8, 10_000) == exact  # exhaustive == brute force
    assert len(got(3, 50) & exact) / len(exact) >= 0.5

"""PCA (similarity/pca.py): the distributed covariance must equal
numpy's to float precision, the projection must equal an independent
numpy-only PCA, and the fit must be layout-invariant."""

from __future__ import annotations

import duckdb
import numpy as np

from frames_spark.similarity.pca import covariance_matrix, fit_pca, project_pca


def _vectors(sf_dir):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, x


def test_covariance_matches_numpy(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cov, mean, n = covariance_matrix(e, "embedding")
    _, x = _vectors(sf_dir)
    fp = 1 << 20
    q = np.floor(x * fp + 0.5)
    exp = np.cov(q.T, bias=True) / fp / fp
    assert n == len(x)
    assert np.allclose(cov, exp, rtol=1e-9, atol=1e-15)
    assert np.allclose(mean, q.mean(axis=0) / fp)


def test_projection_matches_numpy_pca(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = fit_pca(e, "embedding", k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in project_pca(e, "embedding", model).select(
            "vec_id", "pc1", "pc2"
        ).collect()
    }
    ids, x = _vectors(sf_dir)
    # independent numpy PCA on the quantized data
    fp = 1 << 20
    q = np.floor(x * fp + 0.5) / fp
    c = np.cov(q.T, bias=True)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:2]
    comps = vecs[:, order].T
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    # centered projection of the RAW vectors (project_pca centers by
    # the quantized mean; quantization noise is ~1e-6 per component)
    exp = (x - q.mean(axis=0)) @ comps.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], exp[i], atol=2e-4)
    # variance explained is sorted
    assert model.explained_variance[0] >= model.explained_variance[1] > 0


def test_fit_layout_invariant(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m1 = fit_pca(e, "embedding", k=2)
    m2 = fit_pca(e.repartition(7), "embedding", k=2)
    np.testing.assert_array_equal(m1.components, m2.components)

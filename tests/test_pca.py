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


def test_power_pca_converges_to_top_eigenvector(spark, sf_dir):
    """The 10-squaring integer power method (effective power 1024) must land on (±) numpy's
    top eigenvector, its Rayleigh eigenvalue within ~0.1% of eigh's
    top eigenvalue, and the explained fraction within 0.1% of the
    numpy ratio — proving the SQL-oracle-able twin computes the same
    mathematics as the LAPACK production path."""
    from frames_spark.similarity.pca import power_pca_int

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v, lam_micros, frac_micros, d = power_pca_int(e, "embedding")

    _, x = _vectors(sf_dir)
    fp = 1 << 20
    q = np.floor(x * fp + 0.5)
    cov = np.cov(q.T, bias=True) / fp / fp
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]

    u = np.array(v, dtype=np.float64)
    cos = abs(u @ top) / np.linalg.norm(u)
    assert d == len(top)
    assert cos > 0.999, cos
    assert abs(lam_micros / 1e6 - vals[-1]) <= 1e-3 * vals[-1] + 2e-6
    exp_frac = vals[-1] / np.trace(cov)
    assert abs(frac_micros / 1e6 - exp_frac) <= 1e-3 * exp_frac + 2e-6


def test_power_pca_projection_matches_numpy(spark, sf_dir):
    """q_pca_project_power's integer dots equal the numpy dot of the
    quantized corpus against the integer axis, row for row."""
    from frames_spark.queries import QUERIES

    ids, x = _vectors(sf_dir)
    fp = 1 << 20
    q = np.floor(x * fp + 0.5).astype(np.int64)

    from frames_spark.similarity.pca import power_pca_int

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v, _, _, _ = power_pca_int(e, "embedding")
    exp = q @ np.array(v, dtype=np.int64)

    got = {
        r["vec_id"]: r["proj"]
        for r in QUERIES["q_pca_project_power"](spark, sf_dir).collect()
    }
    for vid, want in zip(ids, exp):
        assert got[int(vid)] == int(want)

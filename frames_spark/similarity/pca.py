"""PCA over an embedding column, with the division of labor a
100 TB corpus forces:

- the d x d covariance matrix is computed DISTRIBUTED — upper-triangle
  outer products built in the scan stage (nested array transforms, no
  self-join, map-side partial aggregation; the same plan shape as
  queries.q_embed_covariance) over 2^20 fixed-point components, so the
  matrix is exact integers and identical across partitionings;
- the eigensolve runs on the DRIVER: a d x d symmetric matrix is tiny
  at any corpus size (64 x 64 here), so numpy.linalg.eigh is the right
  tool — distributing it would be theater;
- the projection back onto the corpus is DISTRIBUTED again: the k
  principal components travel as constant-folded array literals into
  one scan-stage expression per output coordinate.

Eigenvectors are sign-canonicalized (largest-|component| entry made
positive) so fits are reproducible run to run; eigh on an exact
integer matrix is deterministic for a fixed numpy/LAPACK build, which
is why q_embed_pca registers rows-only and the pin lives in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.vectors import FIXED_POINT, to_fixed

__all__ = ["PCAModel", "covariance_matrix", "fit_pca", "project_pca"]


@dataclass(frozen=True)
class PCAModel:
    components: np.ndarray  # (k, d) rows = principal axes, unit norm
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    mean: np.ndarray  # (d,) column means of the (unquantized) data


def covariance_matrix(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(cov (d,d) float64, mean (d,), n) from exact fixed-point sums.

    One distributed pass builds the upper-triangle Gram sums and the
    first moments; only O(d^2) aggregated rows reach the driver.
    """
    q = df.select(to_fixed(F.col(vec_col)).alias("qv"))
    terms = q.select(
        F.explode(
            F.expr(
                "flatten(transform(qv, (xi, i) -> "
                "transform(slice(qv, i + 1, size(qv) - i), (xj, jo) -> "
                "struct(i AS i, i + jo AS j, xi * xj AS prod))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.prod")
    gram_rows = (
        terms.groupBy("i", "j")
        .agg(F.sum(F.col("prod").cast("decimal(38,0)")).alias("s_ij"))
        .collect()
    )
    mom_rows = (
        q.select(F.posexplode("qv").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum("qi").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    d = max(r["i"] for r in mom_rows) + 1
    n = int(mom_rows[0]["n"])
    s = np.zeros(d)
    for r in mom_rows:
        s[r["i"]] = float(r["s"])
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = float(r["s_ij"])
    fp = float(FIXED_POINT)
    cov = (g * n - np.outer(s, s)) / n / n / fp / fp
    return cov, s / n / fp, n


def fit_pca(df: DataFrame, vec_col: str, k: int = 2) -> PCAModel:
    cov, mean, _ = covariance_matrix(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    # sign canon: make the largest-|x| entry of each axis positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PCAModel(comps, vals[order], mean)


def project_pca(
    df: DataFrame, vec_col: str, model: PCAModel, prefix: str = "pc"
) -> DataFrame:
    """df + pc1..pck — centered dot products against the component
    literals, evaluated entirely in the scan stage (zip_with +
    aggregate; no UDF, no shuffle)."""
    out = df
    for idx, (axis, mu_shift) in enumerate(
        zip(model.components, model.components @ model.mean), start=1
    ):
        lit = F.array(*[F.lit(float(a)) for a in axis])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                lit,
                lambda x, a: x * a,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"{prefix}{idx}", dot - F.lit(float(mu_shift)))
    return out

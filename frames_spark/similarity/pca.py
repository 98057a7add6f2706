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

__all__ = [
    "PCAModel",
    "covariance_matrix",
    "covariance_int",
    "fit_pca",
    "power_pca_int",
    "project_pca",
]


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


def covariance_int(
    df: DataFrame, vec_col: str
) -> tuple[dict[tuple[int, int], int], int, int]:
    """Exact INTEGER scatter matrix C[i][j] = n*G_ij - S_i*S_j.

    Same distributed pass as :func:`covariance_matrix`, but the Gram
    sums come back as ``decimal(38,0)`` and stay Python ints — no
    float conversion, so C is bit-identical to a SQL twin built from
    the same fixed-point quantization (cov = C / (n^2 * FIXED_POINT^2)).
    Returns (full symmetric {(i, j): c}, n, d).
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
    s = {r["i"]: int(r["s"]) for r in mom_rows}
    cmat: dict[tuple[int, int], int] = {}
    for r in gram_rows:
        i, j = int(r["i"]), int(r["j"])
        c = n * int(r["s_ij"]) - s[i] * s[j]
        cmat[(i, j)] = c
        cmat[(j, i)] = c
    return cmat, n, d


_PCA_SCALE = 1_000_000
_PCA_MAT_SCALE = 100_000_000_000  # 1e11: 64 * (1e11)^2 * 1e11 < HUGEINT max


def _rescale_int(x: int, mx: int, scale: int) -> int:
    """sign(x) * (|x| * scale // mx) — the sign-safe truncating
    rescale Python, Spark and DuckDB agree on for negative operands
    (Python // floors negatives, DuckDB // truncates; on |x| they
    coincide)."""
    q = abs(x) * scale // mx
    return -q if x < 0 else q


def power_pca_int(
    df: DataFrame, vec_col: str, squarings: int = 10
) -> tuple[list[int], int, int, int]:
    """Top principal axis by integer matrix SQUARING — the
    SQL-oracle-able twin of :func:`fit_pca` (which stays the
    production path; LAPACK beats this when you can afford a driver
    eigensolve, but its float internals have no cross-engine replay).

    Plain power iteration needs O(lambda1 / (lambda1 - lambda2))
    rounds — hundreds on a near-isotropic spectrum like random
    embeddings. Repeated squaring reaches effective power 2^k in k
    rounds: 10 squarings = C^1024, which suppresses every trailing
    eigendirection by (lambda_i/lambda_1)^1024 regardless of the gap.
    Each round renormalizes the matrix to ``_PCA_MAT_SCALE`` with the
    sign-safe truncating division (quantization ~1e-11 relative per
    round — far below the 1e-3 verification band, and in any case
    mirrored bit-for-bit by the oracle's CTE rounds). The final axis
    is C^1024 applied to the ones vector; eigenvalue by integer
    Rayleigh quotient against the ORIGINAL scatter matrix,
    explained-variance share against its exact integer trace.
    Returns (v (d,) ints in [-1e6, 1e6], lambda_micros,
    explained_frac_micros, d); lambda is in covariance units (the C
    eigenvalue divided by n^2 * FIXED_POINT^2).
    """
    cmat, n, d = covariance_int(df, vec_col)
    c = [[cmat.get((i, j), 0) for j in range(d)] for i in range(d)]
    mx = max(abs(x) for row in c for x in row)
    m = (
        [[0] * d for _ in range(d)]
        if mx == 0
        else [[_rescale_int(x, mx, _PCA_MAT_SCALE) for x in row] for row in c]
    )
    for _ in range(squarings):
        p = [
            [
                sum(m[i][j] * m[j][k] for j in range(d))
                for k in range(d)
            ]
            for i in range(d)
        ]
        mx = max(abs(x) for row in p for x in row)
        m = (
            p
            if mx == 0
            else [
                [_rescale_int(x, mx, _PCA_MAT_SCALE) for x in row]
                for row in p
            ]
        )
    w = [sum(m[i][j] for j in range(d)) for i in range(d)]  # M @ ones
    mw = max(abs(x) for x in w)
    v = (
        [_PCA_SCALE] * d
        if mw == 0
        else [_rescale_int(x, mw, _PCA_SCALE) for x in w]
    )
    num = sum(v[i] * c[i][j] * v[j] for i in range(d) for j in range(d))
    den = sum(x * x for x in v)
    q1 = num // den  # num >= 0 (C is PSD), den > 0 — truncation-safe
    fp2 = FIXED_POINT * FIXED_POINT
    lambda_micros = q1 * _PCA_SCALE // (n * n * fp2)
    trace = sum(c[i][i] for i in range(d))
    explained_frac_micros = (
        q1 * _PCA_SCALE // trace if trace > 0 else 0
    )
    return v, lambda_micros, explained_frac_micros, d


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

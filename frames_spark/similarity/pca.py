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


def _gram_and_moments(
    df: DataFrame, vec_col: str
) -> tuple[dict[tuple[int, int], int], dict[int, int], int, int]:
    """Exact integer (gram {(i<=j): sum x_i*x_j}, moments {i: sum x_i},
    n, d) in ONE distributed pass + ONE collect (r14 opt: the moment
    sums and the row count ride the gram explode as sentinel keys
    (i,-1) and (-1,-1), halving the scan+job count of both covariance
    entry points). All sums aggregate as decimal(38,0) and come back
    as exact Python ints.

    The input is ``spread`` first: the d(d+1)/2-struct explode is
    pure per-row CPU, and a small parquet corpus arrives as ONE scan
    partition — measured 1.8s single-core vs 0.6s spread at sf0.1;
    a no-op at real scale where scans already carry >= cores
    partitions."""
    from frames_spark.operators.core import spread

    q = spread(df).select(to_fixed(F.col(vec_col)).alias("qv"))
    terms = q.select(
        F.explode(
            F.expr(
                "concat("
                "flatten(transform(qv, (xi, i) -> "
                "transform(slice(qv, i + 1, size(qv) - i), (xj, jo) -> "
                "struct(i AS i, i + jo AS j, xi * xj AS prod)))), "
                "transform(qv, (xi, i) -> "
                "struct(i AS i, -1 AS j, xi AS prod)), "
                "array(struct(-1 AS i, -1 AS j, CAST(1 AS BIGINT) AS prod))"
                ")"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.prod")
    # Two-level sum: per-partition partials in LONG (codegen fast
    # path — the straight decimal(38,0) partial aggregation ran ~25x
    # slower per row, 2.7s vs 0.1s at sf0.1), decimal only over the
    # tiny (partition, i, j) partial relation. Exactness is
    # unconditional: integer addition is commutative/associative, so
    # any grouping gives the same sums, and |prod| < 2^40 means a
    # partition needs > 2^23 rows (≈2 GB at 256 B/row, past the 1 GB
    # split guidance) before a LONG partial could overflow — and ANSI
    # mode (on) RAISES on overflow rather than wrapping, so even that
    # extreme fails loudly, never silently.
    rows = (
        terms.groupBy(F.spark_partition_id().alias("_p"), "i", "j")
        .agg(F.sum("prod").alias("s_part"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("s_part").cast("decimal(38,0)")).alias("s_ij"))
        .collect()
    )
    gram: dict[tuple[int, int], int] = {}
    mom: dict[int, int] = {}
    n = 0
    for r in rows:
        i, j, v = int(r["i"]), int(r["j"]), int(r["s_ij"])
        if i == -1:
            n = v
        elif j == -1:
            mom[i] = v
        else:
            gram[(i, j)] = v
    d = max(mom) + 1
    return gram, mom, n, d


def covariance_matrix(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(cov (d,d) float64, mean (d,), n) from exact fixed-point sums.

    One distributed pass builds the upper-triangle Gram sums, the
    first moments and the count; only O(d^2) aggregated rows reach
    the driver.
    """
    gram, mom, n, d = _gram_and_moments(df, vec_col)
    s = np.zeros(d)
    for i, v in mom.items():
        s[i] = float(v)
    g = np.zeros((d, d))
    for (i, j), v in gram.items():
        g[i, j] = g[j, i] = float(v)
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
    gram, mom, n, d = _gram_and_moments(df, vec_col)
    cmat: dict[tuple[int, int], int] = {}
    for (i, j), g in gram.items():
        c = n * g - mom[i] * mom[j]
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

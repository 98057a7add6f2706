"""Grouped Pandas transforms — the Arrow-batched escape hatch.

Only for semantics the built-in operators genuinely can't express:
per-key ORDER-DEPENDENT recursions (EWMA, stateful scans) where
row t needs row t-1's OUTPUT, which no window frame computes.
Everything else in this library stays JVM-side; these run one
Arrow-batched Python call per group (`applyInPandas`), so the
shuffle is one hash partition on the key and each group must fit
in executor memory — true for per-user/per-entity series, not for
global series (use the bucketed prefix-sum pattern in
operators/rangejoin.py for those).

Frames ref: Frames expresses these as lazy folds over ordered rows
(test/UncurryFold.hs); at scale they become per-key grouped scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma_per_key(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per key in
    event-time order: e_0 = x_0, e_t = alpha*x_t + (1-alpha)*e_{t-1}
    (pandas ewm adjust=False). Adds ``out`` to the schema.

    Bit-exact semantics (load-bearing for the cross-engine oracle):
    pandas short-circuits when x_t == e_{t-1} EXACTLY, keeping the
    average untouched — the recurrence form (1-a)*x + a*x is NOT x
    in floats. Any replica (q_ewma's recursive-CTE oracle) must
    mirror that fixpoint skip; the r12 sf1 sweep caught a last-ulp
    divergence from omitting it on users whose first two values
    collide."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out} double"

    def fn(pdf):
        pdf = pdf.sort_values(ts, kind="mergesort")
        pdf[out] = pdf[value].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema)


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """pandas.merge_asof per key via cogrouped applyInPandas — the
    documented fallback path of operators/asof.asof_join for
    semantics the union-window form can't express (and the proof
    harness for the ones it can: tests hold both implementations to
    each other).

    Scale posture: both sides shuffle once on the key and each key's
    rows stream through pandas in one Arrow batch — fine when no
    single key's history exceeds executor memory; the union-window
    form has no such limit and stays the default.
    """
    import pandas as pd

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema]
    out_fields += [
        f"{right.schema[c].name} {right.schema[c].dataType.simpleString()}"
        for c in value_cols
    ]
    schema = ", ".join(out_fields)
    tol = (
        pd.Timedelta(microseconds=tolerance_micros)
        if tolerance_micros is not None
        else None
    )
    lcols = [f.name for f in left.schema]

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[*lcols, *value_cols])
        lpdf = lpdf.sort_values(ts, kind="mergesort")
        rpdf = rpdf.sort_values(ts, kind="mergesort")[[ts, *value_cols]]
        merged = pd.merge_asof(
            lpdf, rpdf, on=ts, direction=direction, tolerance=tol,
            allow_exact_matches=True,
        )
        return merged[[*lcols, *value_cols]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(fn, schema)
    )


def holt_per_key(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    beta: float,
    level_out: str = "level",
    trend_out: str = "trend",
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per key in
    event-time order — the trend-aware sibling of ewma_per_key and
    the same legitimate-pandas case (row t needs row t-1's OUTPUTS).

      l_0 = x_0, b_0 = 0
      l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
      b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    The Python loop performs EXACTLY these IEEE double ops in this
    order, which is what makes the recursive-CTE oracle bit-stable
    (same recurrence, same operand order, no FMA contraction).
    """
    if not (0 < alpha <= 1 and 0 < beta <= 1):
        raise ValueError("alpha and beta must be in (0, 1]")
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    schema = f"{fields}, {level_out} double, {trend_out} double"

    def fn(pdf):
        pdf = pdf.sort_values(ts, kind="mergesort")
        xs = pdf[value].to_numpy(dtype="float64")
        levels, trends = [], []
        lev, tr = (xs[0] if len(xs) else 0.0), 0.0
        levels.append(lev)
        trends.append(tr)
        for x in xs[1:]:
            prev = lev
            lev = alpha * x + (1 - alpha) * (lev + tr)
            tr = beta * (lev - prev) + (1 - beta) * tr
            levels.append(lev)
            trends.append(tr)
        pdf[level_out] = levels
        pdf[trend_out] = trends
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema)

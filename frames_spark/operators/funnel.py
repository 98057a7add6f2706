"""Ordered event funnels (first-touch conversion).

`funnel_stages` computes, per user, the earliest time each funnel
step was reached where step k must happen strictly AFTER the user's
step k-1 time (classic product-analytics funnel: view -> click ->
purchase). `funnel_counts` folds that into per-step reached-user
counts.

Spark-first shape: one filtered aggregate per step, each keyed by
user — `min(ts)` for step 0, then for step k an equi-join back on
user + residual `ts > t_{k-1}` + min-agg. Every shuffle in the chain
is keyed by the SAME column (user), so Spark reuses the exchange
layout instead of re-shuffling, and each step's input is only the
users still alive in the funnel (monotonically shrinking). No
window over full event history, no per-user event array
materialization — at 100 TB the events table streams through k
filtered scans (or one scan + k reused exchanges with AQE), with
state only O(converted users).

Frames ref: no funnel equivalent; closest is grouped fold order
dependence (test/UncurryFold.hs) — this is the scale extension
surface (SURVEY.md §2b).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, step_0_ts, ..., step_{k-1}_ts) for users who completed
    at least step 0; later columns are null once the funnel breaks.
    Left joins keep partially-converted users visible."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user)
        .agg(F.min(ts).alias("step_0_ts"))
    )
    out = cur
    for k, step in enumerate(steps[1:], start=1):
        prev_ts = f"step_{k - 1}_ts"
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user, ts)
            .join(cur.select(user, prev_ts), user)
            .filter(F.col(ts) > F.col(prev_ts))
            .groupBy(user)
            .agg(F.min(ts).alias(f"step_{k}_ts"))
        )
        out = out.join(nxt, user, "left")
        cur = nxt  # only users alive after step k feed step k+1
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users) — users whose funnel reached each
    step, strictly ordered by event time."""
    stages = funnel_stages(events, steps, user=user, ts=ts, type_col=type_col)
    per_step = [
        stages.agg(
            F.lit(k).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.col(f"step_{k}_ts")).alias("n_users"),
        )
        for k, step in enumerate(steps)
    ]
    out = per_step[0]
    for df in per_step[1:]:
        out = out.unionAll(df)
    return out

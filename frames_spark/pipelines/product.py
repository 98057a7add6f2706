"""Product-analytics pipeline: events -> sessions -> per-user
engagement -> segment, as ONE lazy plan.

The composition twin of pipelines/pretrain.py for the analytics
side: sessionization (lag+cumsum window), per-user rollup, recency
against the corpus horizon, and a rule-based segment label — all
declared up front so Catalyst sees a single DAG. Every shuffle after
the session window is keyed by user_id (exchange reuse); the horizon
is a 1-row max broadcast, never a driver-side collect; monetary
totals ride exact integer micros end-to-end.

Segment rules (plain CASE, deliberately SQL-expressible so the whole
pipeline carries a cross-engine oracle):
  core     recency <= 7 days AND >= 30 sessions
  engaged  recency <= 7 days
  lapsing  recency <= 14 days
  dormant  otherwise
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.operators import window as win_ops

__all__ = ["engagement_segments"]


def engagement_segments(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """(user_id, n_sessions, n_events, total_value_micros,
    recency_days, segment) — one row per user."""
    sess = win_ops.sessionize(
        events, "user_id", "ts", gap_s, order_tiebreak=["event_id"]
    )
    per_user = sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
        ).alias("total_value_micros"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    horizon = events.agg(F.max(F.unix_micros("ts")).alias("max_us"))
    recency_days = F.expr("(max_us - last_us) DIV 86400000000")
    segment = (
        F.when(
            (recency_days <= 7) & (F.col("n_sessions") >= 30), "core"
        )
        .when(recency_days <= 7, "engaged")
        .when(recency_days <= 14, "lapsing")
        .otherwise("dormant")
    )
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            "total_value_micros",
            recency_days.cast("long").alias("recency_days"),
            segment.alias("segment"),
        )
    )

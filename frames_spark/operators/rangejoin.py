"""Range (interval) join — pair left rows with right rows whose
timestamp falls in [left.ts, left.ts + window] for the same key.

A naive `l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + W` join gives
Spark a non-equi condition: with the key it's still a sort-merge join
per key group but degenerates to a per-key scan when keys are hot;
without a key it's a BroadcastNestedLoopJoin — O(n*m). The scalable
formulation buckets time by the window width W: a right row at time t
can only match left rows whose bucket is floor(t/W) or floor(t/W)-1,
so the right side explodes into exactly 2 (key, bucket) rows and the
join becomes a pure equi-join on (key, bucket) + a residual range
filter. Each qualifying pair survives exactly once because the left
row's bucket is unique — no post-dedup needed.

At 100 TB this is one shuffle on (key, bucket) with 2x amplification
of the smaller side, AQE-skew-splittable; the naive form is a
potentially unbounded per-key product.

Reference scope note: Frames (Joins.hs) has equi-joins only; range
join is part of the engine's extended OLAP surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and
    ``right_ts`` in ``[left_ts, left_ts + window_seconds]``.

    Column names (other than ``key``) must be disjoint between the
    two sides; all columns of both survive.
    """
    w = int(window_seconds)
    if w <= 0:
        # w=0 would divide by zero inside the bucket expr, which SQL
        # nulls out and the equi-join then silently drops every row
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    # all time math in exact integer MICROS: unix_timestamp()
    # truncates to whole seconds, so the residual bound would admit
    # pairs up to a second past the window when the fractions line up
    w_us = w * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / w_us)
    rt = F.unix_micros(F.col(right_ts))
    lhs = left.withColumn("_rb", lb.cast("long"))
    rhs = right.withColumn(
        "_rb", F.explode(F.array(F.floor(rt / w_us) - 1, F.floor(rt / w_us)))
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._rb") == F.col("r._rb"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.unix_micros(F.col(f"r.{right_ts}"))
            <= F.unix_micros(F.col(f"l.{left_ts}")) + w_us
        )
    )
    out = lhs.alias("l").join(rhs.alias("r"), cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return out.select(*keep)


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency: how many intervals are open at
# each change point. Half-open [start, end) semantics: an interval
# ending exactly when another starts does not overlap it.
#
# A naive running sum over all change points is ONE global window —
# a single-partition sequential scan, the classic 100 TB bottleneck.
# Instead: two-phase prefix sum. Net deltas aggregate per change
# point (shuffle 1), per-BUCKET running offsets are computed over the
# tiny bucket relation (#buckets rows, e.g. days), and the
# within-bucket running sum is a window PARTITIONED by bucket —
# fully parallel. concurrent = bucket_offset + within_bucket_cumsum.
# ---------------------------------------------------------------------------


def interval_concurrency(
    df: DataFrame,
    start: str,
    end: str,
    bucket: str = "day",
) -> DataFrame:
    """(t, concurrent): open-interval count after processing all
    events at time t. Change points only; constant between rows."""
    from pyspark.sql import Window

    deltas = df.select(F.col(start).alias("t"), F.lit(1).alias("d")).unionAll(
        df.select(F.col(end).alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("d").alias("net"))
    bucketed = per_t.withColumn("b", F.date_trunc(bucket, F.col("t")))
    # per-bucket exclusive prefix: offset = cumsum(bucket nets) - own net
    bw = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    offsets = (
        bucketed.groupBy("b")
        .agg(F.sum("net").alias("bnet"))
        .select(
            "b", (F.sum("bnet").over(bw) - F.col("bnet")).alias("offset")
        )
    )
    iw = (
        Window.partitionBy("b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.withColumn("__run", F.sum("net").over(iw))
        .join(offsets, "b")
        .select("t", (F.col("offset") + F.col("__run")).alias("concurrent"))
    )

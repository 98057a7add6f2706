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
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / w)
    rt = F.unix_timestamp(F.col(right_ts))
    lhs = left.withColumn("_rb", lb.cast("long"))
    rhs = right.withColumn(
        "_rb", F.explode(F.array(F.floor(rt / w) - 1, F.floor(rt / w)))
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._rb") == F.col("r._rb"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.unix_timestamp(F.col(f"r.{right_ts}"))
            <= F.unix_timestamp(F.col(f"l.{left_ts}")) + w
        )
    )
    out = lhs.alias("l").join(rhs.alias("r"), cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return out.select(*keep)

"""Window/analytic operators.

Frames has no native window functions — users drop to hand-written
folds over sorted frames (demo/Kata04.hs sorts to find extrema).
These are the Spark-native expressions of those idioms plus the
standard OLAP set the engine needs at scale.

Scale notes: every window here partitions by a key (supplier, user,
segment) so state is bounded per key; none uses a global unpartitioned
window in the hot path. Top-k uses row_number + filter, which AQE
executes as partial top-k per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order: Column | str | Sequence[Column | str]) -> list[Column]:
    """Normalize an order spec. A bare string would otherwise be
    ITERATED CHARACTER BY CHARACTER by orderBy(*order) — a silent
    nonsense window and a baffling unresolved-column error."""
    if isinstance(order, (str, Column)):
        order = [order]
    return [F.col(c) if isinstance(c, str) else c for c in order]


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Column | str | Sequence[Column | str],
    k: int,
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order))
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order: Column | str | Sequence[Column | str],
    value: Column,
    alias: str = "running_sum",
) -> DataFrame:
    w = (
        Window.partitionBy(*keys)
        .orderBy(*_order_cols(order))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: new session when the time since the
    previous event exceeds ``gap_seconds``. lag + cumulative sum over a
    per-user window — the batch twin of streaming session_window."""
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_seconds)
    ).cast("long")
    return df.withColumn("session_id", F.sum(is_new).over(w))

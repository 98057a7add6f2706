"""As-of (merge_asof) join — attach the adjacent right-side row per key.

Spark has no native as-of join. The scalable exact formulation is the
union-window trick: tag both sides, union, and carry the right value
through a per-key window ordered by (ts, side, tiebreak) — ONE
shuffle on the key, no range explosion, no per-group pandas.

Directions (pandas.merge_asof parity):
  * ``backward`` (default): latest right row with right.ts <= left.ts
    — last(ignoreNulls) over an UNBOUNDED PRECEDING..CURRENT frame;
    right rows sort BEFORE left at equal ts so an exactly-at match is
    visible, and among right ties the highest tiebreak wins.
  * ``forward``: earliest right row with right.ts >= left.ts —
    first(ignoreNulls) over CURRENT..UNBOUNDED FOLLOWING; right rows
    sort AFTER left at equal ts, and among ties the lowest tiebreak
    wins.
  * ``nearest``: the closer of the two, backward winning ties (pandas
    semantics). Still ONE shuffle: both carries are frames over the
    SAME union — right rows sort before left at equal ts, so the
    backward frame sees distance-0 matches and the forward frame only
    strictly-later rows, which ties resolve toward backward anyway.

``tolerance_micros`` bounds |right.ts - left.ts| exactly like pandas'
tolerance: matches farther away null out, applied as a post-condition
on the carried match timestamp — no extra shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_MTS = "_asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    right_tiebreak: str,
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Left rows + ``value_cols`` carried from the adjacent right row
    (see module docstring for direction/tolerance semantics)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    # Right rows sort before left at equal ts (side: right=0, left=1)
    # EXCEPT pure-forward, where the at-ts right row must sit inside
    # the CURRENT..FOLLOWING frame of its left twin.
    left_tag, right_tag = (1, 0) if direction != "forward" else (0, 1)
    lhs = left.withColumn("_side", F.lit(left_tag))
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    lhs = lhs.withColumn(_MTS, F.lit(None).cast(right.schema[ts].dataType))
    if right_tiebreak not in lhs.columns:
        lhs = lhs.withColumn(
            right_tiebreak, F.lit(None).cast(right.schema[right_tiebreak].dataType)
        )
    rhs = (
        right.select(key, ts, right_tiebreak, *value_cols)
        .withColumn("_side", F.lit(right_tag))
        .withColumn(_MTS, F.col(ts))
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    base = Window.partitionBy(key).orderBy(
        F.col(ts), F.col("_side"), F.col(right_tiebreak)
    )
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried_cols = [*value_cols, _MTS]

    def right_only(c: str) -> Column:
        return F.when(F.col("_side") == right_tag, F.col(c))

    def carry(c: str, how: str) -> Column:
        if how == "backward":
            return F.last(right_only(c), ignorenulls=True).over(wb)
        return F.first(right_only(c), ignorenulls=True).over(wf)

    passthrough = [c for c in unioned.columns if c not in carried_cols]
    if direction in ("backward", "forward"):
        out = unioned.select(
            *passthrough,
            *[carry(c, direction).alias(c) for c in carried_cols],
        ).filter(F.col("_side") == left_tag)
        if tolerance_micros is not None:
            gap = F.abs(F.unix_micros(F.col(_MTS)) - F.unix_micros(F.col(ts)))
            keep = gap <= F.lit(tolerance_micros)
            for c in value_cols:
                out = out.withColumn(c, F.when(keep, F.col(c)))
        return out.drop("_side", _MTS)

    # nearest: both carries over the same union, pick the closer side
    both = unioned.select(
        *passthrough,
        *[carry(c, "backward").alias(f"_b_{c}") for c in carried_cols],
        *[carry(c, "forward").alias(f"_f_{c}") for c in carried_cols],
    ).filter(F.col("_side") == left_tag)
    bgap = F.abs(F.unix_micros(F.col(f"_b_{_MTS}")) - F.unix_micros(F.col(ts)))
    fgap = F.abs(F.unix_micros(F.col(f"_f_{_MTS}")) - F.unix_micros(F.col(ts)))
    if tolerance_micros is not None:
        tol = F.lit(tolerance_micros)
        bgap = F.when(bgap <= tol, bgap)  # out-of-tolerance side -> null
        fgap = F.when(fgap <= tol, fgap)
    use_back = F.when(fgap.isNull(), bgap.isNotNull()).otherwise(
        bgap.isNotNull() & (bgap <= fgap)
    )
    use_fwd = F.when(bgap.isNull(), fgap.isNotNull()).otherwise(
        fgap.isNotNull() & (fgap < bgap)
    )
    out = both
    for c in value_cols:
        out = out.withColumn(
            c,
            F.when(use_back, F.col(f"_b_{c}")).when(use_fwd, F.col(f"_f_{c}")),
        )
    return out.drop(
        "_side", *[f"_b_{c}" for c in carried_cols], *[f"_f_{c}" for c in carried_cols]
    )

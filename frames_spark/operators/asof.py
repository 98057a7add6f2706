"""As-of (merge_asof) join — attach the latest right-side row with
ts <= left.ts per key.

Spark has no native as-of join. The scalable exact formulation is the
union-window trick: tag both sides, union, and take
last(right value, ignoreNulls) over a per-key window ordered by
(ts, side, tiebreak) — ONE shuffle on the key, no range explosion,
no per-group pandas. (pd.merge_asof via applyInPandas is the fallback
for semantics this can't express, e.g. nearest-direction or
tolerance; tolerance is expressible here with an extra filter.)

Tie semantics: right rows sort before left rows at equal ts, so a
right row AT the left timestamp is visible (<=, like
pandas.merge_asof(direction='backward')). Among right ties the
highest tiebreak wins (deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    right_tiebreak: str,
) -> DataFrame:
    """Left rows + columns ``value_cols`` carried from the latest
    right row with right.ts <= left.ts and matching ``key``."""
    lhs = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    if right_tiebreak not in lhs.columns:
        lhs = lhs.withColumn(
            right_tiebreak, F.lit(None).cast(right.schema[right_tiebreak].dataType)
        )
    rhs = right.select(
        key, ts, right_tiebreak, *value_cols
    ).withColumn("_side", F.lit(0))
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"), F.col(right_tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")

"""Slowly-changing-dimension (SCD type 2) versioning from an update
stream: collapse consecutive no-change updates, emit one row per
VERSION with [valid_from, valid_to) effective ranges (valid_to null
on the current version).

Spark-first shape: two window passes over the same (key, ts)
partitioning — lag() to detect attribute changes, lead() after the
change-filter to close each version's interval. One shuffle total:
both windows and the filter share the (key x ts) sort, and Spark
executes them in a single exchange + sort.

At 100 TB this is the standard way to build a versioned dim from a
CDC/update feed without a self-join: the alternative
"join each update to the next one" shuffles twice and skews on hot
keys; lag/lead is one pass.

Frames ref: no SCD equivalent (static frames); OLAP surface
(SURVEY.md §2c).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """(key, *attrs, valid_from, valid_to) — one row per attribute
    version. Ties on ts are broken by the attribute values themselves
    so the result is deterministic under concurrent updates."""
    order = [F.col(ts), *[F.col(a) for a in attrs]]
    w = Window.partitionBy(key).orderBy(*order)
    # the first row is ALWAYS a version — detected explicitly, since
    # a null attribute on row 1 null-safe-equals lag()'s null and a
    # pure inequality test would drop it
    changed = F.row_number().over(w) == 1
    for a in attrs:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    flagged = df.select(
        key, *attrs, F.col(ts).alias("valid_from"), changed.alias("__chg")
    )
    wv = Window.partitionBy(key).orderBy("valid_from", *[F.col(a) for a in attrs])
    return (
        flagged.filter(F.col("__chg"))
        .withColumn("valid_to", F.lead("valid_from").over(wv))
        .drop("__chg")
    )

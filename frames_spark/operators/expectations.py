"""Data-quality expectation checks.

A training-data pipeline gates ingest on these: uniqueness of keys,
referential integrity between fact and dim, value ranges, null
contracts, and a one-pass column profile. Every check RETURNS THE
VIOLATIONS as a DataFrame (empty = pass) rather than a boolean, so
the violating rows can be quarantined/logged — and the checks stay
lazy, composing into the ingest plan.

Scale shapes: uniqueness is one partial-aggregated groupBy on the
key; orphan checks are left-anti joins (broadcast when the parent
key set is dim-sized); profile is ONE full-scan aggregate for all
requested columns together (never one pass per column).

Frames ref: Frames encodes these statically (types + Maybe columns,
src/Frames/CSV.hs readTableMaybe); at runtime scale they become
violation queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples that occur more than once (with their counts)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose key has no match in the parent (FK violation).

    The anti-join ships only the parent KEY column; broadcast it when
    the parent is dim-sized so the child never shuffles.
    """
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    return child.join(keys, child_key, "left_anti")


def out_of_range(
    df: DataFrame, col: Column | str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """Rows whose value falls outside [lo, hi] (None = unbounded).
    Null values are NOT range violations (see null_violations)."""
    col = F.col(col) if isinstance(col, str) else col
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (col < lo)
    if hi is not None:
        cond = cond | (col > hi)
    return df.filter(cond)


def null_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows with a null in any of the declared NOT-NULL columns."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_null,
    n_distinct) in long form. A single aggregate computes every
    column's stats together — one scan regardless of column count.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select(
        "p.column", "p.n_rows", "p.n_null", "p.n_distinct"
    )

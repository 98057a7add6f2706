"""Reshape: melt (wide→long) and pivot (long→wide).

Reference: src/Frames/Melt.hs:104 ``melt`` — keep id columns, turn the
remaining value columns into (variable, value) rows. The Spark-first
form is the built-in ``unpivot`` (SQL ``stack``): a narrow per-row
expansion with NO shuffle — each input row yields k output rows
locally, so it scales linearly and preserves partitioning of the scan.

Pivot is the inverse (Frames users round-trip via external tools;
included for completeness): ``groupBy().pivot(values=...)`` — passing
the explicit value list avoids the extra distinct-collect job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long. Value columns are cast to a common type (double
    here, matching Frames' requirement that melted values share a
    universe type — Melt.hs 'Field ts' CoRec)."""
    casted = df.select(
        *ids, *[F.col(c).cast("double").alias(c) for c in values]
    )
    return casted.unpivot(list(ids), list(values), var_name, value_name)


def pivot(
    df: DataFrame,
    ids: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg,
) -> DataFrame:
    """Long→wide with an explicit pivot-value list (no discovery scan)."""
    return df.groupBy(*ids).pivot(pivot_col, list(pivot_values)).agg(agg)

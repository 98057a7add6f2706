"""Missing-data handling.

Reference: Frames parses unparseable cells into ``Maybe`` columns
(src/Frames/CSV.hs:319 ``readTableMaybe``), then either fills
defaults (demo/MissingData.hs — an 'en passant Default class' rapply)
or filters by presence (test/UncurryFoldPartialData.hs keeps rows
whose prestige failed to parse, projects income, drops Nothings).

Spark-first: Maybe == nullable; fill is ``coalesce``/``fillna`` (pure
JVM expressions, no shuffle), presence filters are null predicates
that push down to the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """rapply with a Default record — per-column default fill."""
    return df.withColumns(
        {c: F.coalesce(F.col(c), F.lit(v)) for c, v in defaults.items()}
    )


def drop_missing(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Keep only fully-parsed rows (recMaybe == Just)."""
    return df.dropna(how="any", subset=list(cols) if cols else None)


def keep_missing(df: DataFrame, col: str) -> DataFrame:
    """Keep rows where ``col`` failed to parse (UncurryFoldPartialData)."""
    return df.filter(F.col(col).isNull())


def with_nulls(df: DataFrame, col: str, when_null: Column) -> DataFrame:
    """Derive a Maybe-column: null out values matching a predicate."""
    return df.withColumn(
        col, F.when(when_null, F.lit(None)).otherwise(F.col(col))
    )

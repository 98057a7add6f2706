"""Categorical columns.

Reference: src/Frames/Categorical.hs:66 ``declareCategorical`` — a
bounded-cardinality text column becomes an enum type: the set of
categories plus a stable code per category. At runtime on Spark this
is a dictionary: distinct values with dense codes assigned by sorted
order (stable across runs/engines), broadcast back onto the data.

Scale: the dictionary is tiny by definition (bounded cardinality), so
encoding is a broadcast join — no shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def categories(df: DataFrame, col: str) -> DataFrame:
    """Distinct categories with stable dense codes (sorted order)."""
    w = Window.orderBy(F.col("category"))
    return (
        df.select(F.col(col).alias("category"))
        .distinct()
        .select("category", (F.dense_rank().over(w) - 1).alias("code"))
    )


def encode(df: DataFrame, col: str, code_name: str | None = None) -> DataFrame:
    """Attach the category code column via broadcast join."""
    code_name = code_name or f"{col}_code"
    dictionary = categories(df, col).withColumnsRenamed(
        {"category": col, "code": code_name}
    )
    return df.join(F.broadcast(dictionary), col, "left")


def one_hot(df: DataFrame, col: str, values: list[str]) -> DataFrame:
    """One-hot indicator columns for an explicit category list."""
    return df.withColumns(
        {
            f"{col}__{v}": (F.col(col) == F.lit(v)).cast("int")
            for v in values
        }
    )

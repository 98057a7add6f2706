"""Aggregation operators — Frames expresses these as composable
``foldl`` folds run in a single traversal (reference:
benchmarks/InsuranceBench.hs, benchmarks/BenchDemo.hs,
test/UncurryFold.hs). The Spark-first equivalent is one ``agg`` with
many aggregate expressions: Catalyst fuses them into a single pass
with map-side partial aggregation, which is exactly the fold-fusion
the reference hand-builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_ratio(df: DataFrame, num: str, den: str, alias: str = "mean_ratio") -> DataFrame:
    """Average of num/den across rows.

    Reference: test/UncurryFold.hs (avg income/prestige). Projection
    of just the two columns reaches the parquet scan (column pruning).
    """
    return df.select((F.col(num) / F.col(den)).alias("_ratio")).agg(
        F.avg("_ratio").alias(alias)
    )


def column_means(df: DataFrame, cols: list[str]) -> DataFrame:
    """Means of several columns in ONE pass (fused multi-fold).

    Reference: benchmarks/panda.py / BenchDemo.hs compute two column
    means; Frames fuses the folds so the data is traversed once.
    """
    return df.agg(*[F.avg(c).alias(f"mean_{c}") for c in cols])


def group_fold(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship query — TPC-H Q1 shape: grouped multi-aggregate fold.

    The Frames idiom is a dictionary of folds applied per group
    (benchmarks/InsuranceBench.hs); here all eight aggregates fuse
    into one shuffle with partial (map-side) aggregation. Group
    cardinality is tiny (RF x LS <= 6), so the shuffle moves only
    per-partition partial states — scale-safe at any SF.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def argmax(df: DataFrame, value_col: str, tiebreak: list[str]) -> DataFrame:
    """Row achieving the maximum of ``value_col``.

    Reference: demo/Kata04.hs ``maximumBy (comparing range)``. A total
    order (value desc, then tiebreak asc) makes the result
    deterministic; ORDER BY + LIMIT 1 lets Spark run a top-1
    per-partition then merge — no full sort materialization.
    """
    order = [F.col(value_col).desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(1)

"""Sinks: partitioned parquet and bucketed tables.

Frames' output surface is writeCSV/writeDSV (reference:
src/Frames/CSV.hs:505,518 — covered by sources/csv.py write_csv).
At 100 TB the write layout IS the read plan for every downstream
query, so the engine's native sinks are:

- partition-by-natural-key parquet: partition pruning turns
  point/range predicates on the partition column into directory
  skips (no file even opened);
- bucketed tables on a join/agg key: both sides pre-hashed into the
  same bucket layout join with ZERO exchange — the single biggest
  shuffle saving available for repeated fact-fact joins.

``repartition(partition_cols)`` before a partitioned write keeps it
to one file per partition directory instead of
(input_partitions x partition_values) small files — the classic
small-files failure at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Parquet partitioned by ``partition_cols``, one file per
    partition value (repartitioned to avoid small-files explosion)."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (optionally sorted) parquet table in the
    session catalog (external at ``path`` if given — the warehouse
    dir is static config and cannot move per-write). Joins and
    aggregations between tables bucketed the same way on the same
    key run shuffle-free."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

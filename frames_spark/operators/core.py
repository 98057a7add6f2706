"""Row/column core algebra.

Frames equivalents: projection ``rcast``/``select``
(src/Frames/Exploration.hs:47), filter ``filterFrame``
(src/Frames/InCore.hs:222), field update ``rputField`` / add column
``frameCons`` (src/Frames/Rec.hs), take/drop rows
(src/Frames/Exploration.hs:120,125), horizontal concat ``zipFrames``
(src/Frames/Frame.hs:68), chunking ``frameChunks``
(src/Frames/InCore.hs:256), preview ``showFrame``
(src/Frames/Exploration.hs:129).

All are thin, declarative DataFrame ops so Catalyst can push
projections/predicates into the scan. ``zip_frames`` is the one
operator whose Frames semantics (positional alignment) is hostile to
distributed execution — it requires a total order; we make that
explicit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """rcast/select — column pruning reaches the parquet scan."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """filterFrame — predicate pushdown reaches the parquet scan."""
    return df.filter(predicate)


def mutate(df: DataFrame, **cols: Column) -> DataFrame:
    """rputField/frameCons — add or replace columns (JVM expressions)."""
    return df.withColumns(dict(cols))


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Column renaming (Frames' rowGen prefix / header override)."""
    return df.withColumnsRenamed(mapping)


def take_rows(df: DataFrame, n: int, order: Sequence[Column | str]) -> DataFrame:
    """takeRows — deterministic head requires a total order.

    orderBy+limit compiles to TakeOrderedAndProject: per-partition
    top-n then a single merge, no global sort materialization.
    """
    return df.orderBy(*order).limit(n)


def drop_rows(df: DataFrame, n: int, order: Sequence[Column | str]) -> DataFrame:
    """dropRows — skip the first n rows of the total order."""
    return df.orderBy(*order).offset(n)


def zip_frames(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
) -> DataFrame:
    """zipFrames — positional horizontal concat.

    Frames zips two in-core frames row-by-row (Frame.hs:68). In a
    distributed setting "row i" only exists under an explicit total
    order, so callers must provide one per side; rows are aligned by
    a global row index and inner-joined on it. The index comes from
    the two-phase distributed rank (operators/ranking.py: range
    partition + tiny offset histogram), NOT a single global
    row_number window — each side's sort parallelizes across
    ``shuffle.partitions`` tasks instead of collapsing onto one.
    The alignment join itself still shuffles both sides on the
    index; at 100 TB prefer a real join key over positional zip.
    """
    from frames_spark.operators.ranking import grouped_rank

    lhs = grouped_rank(left, [], list(left_order), rank_col="_zip_idx").drop(
        "group_cnt"
    )
    rhs = grouped_rank(right, [], list(right_order), rank_col="_zip_idx").drop(
        "group_cnt"
    )
    return lhs.join(rhs, "_zip_idx", "inner").drop("_zip_idx")


def chunked(df: DataFrame, num_chunks: int) -> DataFrame:
    """frameChunks — explicit re-partitioning for parallel traversal.

    Frames splits an in-core frame into n chunks for parallel folds;
    Spark's unit of parallelism is the partition, so this is just a
    round-robin repartition.
    """
    return df.repartition(num_chunks)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan out a narrow scan before CPU-heavy per-row work.

    A small parquet file arrives as ONE partition, so an expression-
    heavy pipeline (shingling, hashing, vector math) runs on one core
    no matter how many are free — maxPartitionBytes can't split below
    file/row-group granularity. Repartitioning a few MB of input is
    noise next to the per-row compute it unlocks; at real scale inputs
    already have >= cores partitions and this is a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def preview(df: DataFrame, n: int = 10) -> str:
    """showFrame/printFrame — driver-side peek via take(n), never collect."""
    return df._show_string(n, 0, False)


def stack_frames(frames: Sequence[DataFrame], allow_missing: bool = False) -> DataFrame:
    """Vertical concat by COLUMN NAME (Frames appends rows of the
    same record type; distributed frames must align by name, not
    position — a positional unionAll silently mismatches reordered
    schemas). ``allow_missing`` null-fills columns absent on one
    side instead of raising — the schema-drift ingest case.
    """
    if not frames:
        raise ValueError("stack_frames needs at least one frame")
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out

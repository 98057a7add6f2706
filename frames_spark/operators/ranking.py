"""Two-phase distributed ranking over a strict total order.

The naive form — ``row_number() OVER (PARTITION BY g ORDER BY k)`` —
parallelizes by ``g``'s cardinality: with a 5-value grouping column,
5 tasks each sort 1/5 of the fact table, which is a scale killer at
100 TB no matter how many executors exist. These helpers rebuild the
same exact ranks with parallelism ``num_partitions × |g|``:

1. ``repartitionByRange`` on (group ⧺ order) so every task holds a
   contiguous slice of each group's total order. The explicit
   partition count keeps AQE from re-coalescing the exchange, so the
   partition ids seen by both consumer branches are identical.
2. A tiny per-(partition, group) histogram — at most
   ``num_partitions × |groups|`` rows — turned into exclusive prefix
   offsets with a window over the *histogram*, never the fact table.
3. A local ``row_number`` within each (partition, group) slice plus
   the broadcast offset = the exact global rank.

Requires the order key to be a strict total order within each group
(e.g. tie-broken by a unique key); with ties broken, ``rank``,
``dense_rank`` and ``row_number`` coincide and ``cume_dist`` /
``percent_rank`` / ``ntile`` are pure arithmetic on (rank, count).

Frames ref: analogous to the ordered fold idioms over whole frames
(reference: src/Frames/Folds.hs) — Frames runs them single-node where
total order is free; on Spark order must be re-established per slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_rank", "grouped_prefix_sum", "ntile_from_rank"]


def _auto_stage(df: DataFrame, stage: bool | None) -> bool:
    """Resolve the staging decision for a two-branch consumer.

    The ranked branch and the histogram branch both consume one
    repartitionByRange exchange; correctness requires both branches
    to observe IDENTICAL partition ids. Rank corruption from branch
    divergence has now been caught live FOUR times: three
    exchange-fed inputs (q_rfm, q_mann_whitney at sf0.1, two latent
    join-fed callers) — which led to a plan-inspection heuristic
    (stage iff the input plan contains an Exchange) — and then, r12,
    a PLAIN SCAN-FED input (q_sample_per_source at sf1: 90/180 of
    200 rows, session-shape-dependent). The scan-fed failure breaks
    the heuristic's premise: RangePartitioner's sample seed derives
    from the RDD id, a per-session counter, so whenever ReuseExchange
    fails to dedupe the two subtrees (AQE stage planning makes this
    session-history-dependent), the branches sample DIFFERENT range
    bounds and disagree on ``spark_partition_id`` even over a
    deterministic scan. There is no plan shape that provably reuses,
    so the default is now: ALWAYS stage (one lazy localCheckpoint of
    the partitioned slice — it replaces the second exchange
    evaluation, so the cost is bounded and often negative).
    ``stage=False`` remains for formulation-equivalence tests only.
    """
    return True if stage is None else stage


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    num_partitions: int | None = None,
    rank_col: str = "rn",
    count_col: str = "group_cnt",
    stage: bool | None = None,
) -> DataFrame:
    """df + [rank_col, count_col]: exact 1-based row_number within each
    group under ORDER BY order_cols, and the group's total row count.

    group_cols are column NAMES (they key joins/aggregations);
    order_cols may be names or Column expressions and must form a
    strict total order inside each group. Empty group_cols ranks the
    whole frame — still distributed, since only the per-partition
    histogram (not the data) passes through a global window.

    DETERMINISM REQUIREMENT: the ranked branch and the histogram
    branch must observe ONE evaluation of the range exchange.
    ``stage=None`` (default) localCheckpoints the partitioned
    relation unconditionally — RangePartitioner's sample seed
    derives from the per-session RDD id, so ReuseExchange is the
    only thing keeping the branches consistent and it is
    session-shape-dependent (see ``_auto_stage`` for the four live
    corruptions, the last on a plain scan-fed input at sf1).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    as_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    order_exprs = [as_col(c) for c in order_cols]
    keys = [*[as_col(c) for c in group_cols], *order_exprs]
    do_stage = _auto_stage(df, stage)
    part = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    if do_stage:
        part = part.localCheckpoint(eager=False)
    wloc = Window.partitionBy("_pid", *group_cols).orderBy(*order_exprs)
    ranked = part.withColumn("_lrn", F.row_number().over(wloc))

    # Histogram branch: one row per (partition, group) — bounded by
    # n × |groups|, so the prefix-sum window below is over a tiny
    # relation and the join back is broadcast.
    cnts = part.groupBy("_pid", *group_cols).agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*group_cols)
    offs = cnts.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
        F.sum("_n").over(wtot).alias(count_col),
    )
    return (
        ranked.join(F.broadcast(offs), ["_pid", *group_cols])
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_from_rank(rank: Column, cnt: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) as arithmetic on an exact strict-order rank:
    the first ``cnt % buckets`` buckets get ``cnt div buckets + 1``
    rows, the rest ``cnt div buckets``."""
    base = (cnt / buckets).cast("long")  # floor div for non-negative cnt
    rem = cnt % buckets
    big = base + 1  # size of the first `rem` buckets
    r0 = rank - 1
    in_big = r0 < rem * big
    return (
        F.when(in_big, (r0 / big).cast("long") + 1)
        .otherwise(rem + ((r0 - rem * big) / F.nullif(base, F.lit(0))).cast("long") + 1)
        .cast("long")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    value_col: str,
    num_partitions: int | None = None,
    cum_col: str = "cum",
    total_col: str = "group_total",
    stage: bool | None = None,
) -> DataFrame:
    """df + [cum_col, total_col]: exact inclusive running sum of
    ``value_col`` within each group under ORDER BY order_cols, plus
    the group total — the VALUE counterpart of grouped_rank, same
    two-phase shape: per-(partition, group) subtotal histogram →
    exclusive offsets via a window over the histogram only → local
    running sum + broadcast offset. A naive
    `sum() OVER (ORDER BY ...)` is a single-task sort at fact scale;
    this keeps parallelism at num_partitions x |groups|.

    Same determinism requirement as grouped_rank (both branches must
    observe one evaluation of the range exchange); ``stage=None``
    stages unconditionally (``_auto_stage``).
    Use integer/decimal value columns — float partial sums would make
    the offsets partition-dependent.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    as_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    order_exprs = [as_col(c) for c in order_cols]
    keys = [*[as_col(c) for c in group_cols], *order_exprs]
    do_stage = _auto_stage(df, stage)
    part = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    if do_stage:
        part = part.localCheckpoint(eager=False)
    wloc = Window.partitionBy("_pid", *group_cols).orderBy(*order_exprs)
    local = part.withColumn("_lcum", F.sum(value_col).over(wloc))

    subs = part.groupBy("_pid", *group_cols).agg(
        F.sum(value_col).alias("_s")
    )
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*group_cols)
    offs = subs.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_s").over(woff), F.lit(0)).alias("_off"),
        F.sum("_s").over(wtot).alias(total_col),
    )
    return (
        local.join(F.broadcast(offs), ["_pid", *group_cols])
        .withColumn(cum_col, F.col("_off") + F.col("_lcum"))
        .drop("_pid", "_lcum", "_off")
    )

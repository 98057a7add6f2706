"""Query registry: SURVEY.md §2 key -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for each key.

Cross-engine determinism: double-typed aggregates are computed over
exact DECIMAL casts (order-independent), then cast back to DOUBLE —
plain double sums vary in the last ulps with partition order, which
would break the driver's value-hash. See SURVEY.md §4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frames_spark.operators import aggregate as agg_ops
from frames_spark.operators import categorical as cat_ops
from frames_spark.operators import core as core_ops
from frames_spark.operators import joins as join_ops
from frames_spark.operators import melt as melt_ops
from frames_spark.operators import missing as missing_ops
from frames_spark.operators import window as win_ops
from frames_spark.operators.ranking import grouped_rank, ntile_from_rank
from frames_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: grouped multi-aggregate fold (TPC-H Q1 shape).
# Frames ref: benchmarks/InsuranceBench.hs (fused folds per group).
# ---------------------------------------------------------------------------

# Exact DECIMAL sums; the handoff to DOUBLE goes through BIGINT
# micros (sum*1e6 is integral — inputs have <= 6 decimals), because
# engines round a >16-digit DECIMAL -> DOUBLE cast differently
# (caught at sf0.1: identical decimal sums, last-ulp double drift).
# int64 -> double is IEEE round-to-nearest everywhere.
_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(8,6)))
                * (1 + CAST(l_tax AS DECIMAL(8,6)))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_group_fold", _Q1_ORACLE)
def q_group_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(8,6)")
    tax = F.col("l_tax").cast("decimal(8,6)")
    n = F.count(F.lit(1))

    def dbl(dec_sum: F.Column) -> F.Column:
        # exact decimal -> integral micros (inputs have <= 6 decimals)
        # -> int64 -> double: deterministic across engines, unlike a
        # direct >16-digit decimal->double cast
        return (dec_sum * 1000000).cast("long").cast("double") / F.lit(1000000.0)

    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(qty)).alias("sum_qty"),
            dbl(F.sum(price)).alias("sum_base_price"),
            dbl(F.sum(price * (1 - disc))).alias("sum_disc_price"),
            dbl(F.sum(price * (1 - disc) * (1 + tax))).alias("sum_charge"),
            (dbl(F.sum(qty)) / n).alias("avg_qty"),
            (dbl(F.sum(price)) / n).alias("avg_price"),
            (dbl(F.sum(disc)) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# Non-decimal variant used by bench.py — on a real deployment doubles
# are fine (the decimal casts above exist for cross-engine hashing).
def q1_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_ops.group_fold(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# §2a Frames parity — simple folds / row-column algebra
# ---------------------------------------------------------------------------

# Mean of a per-row ratio (test/UncurryFold.hs: avg income/prestige).
# Arbitrary quotient doubles land on decimal-rounding ties (e.g.
# x.4796875), which Spark and DuckDB break differently — so the
# portable rounding is floor(x*1e6 + 0.5) as an exact integer of
# micro-units: pure IEEE ops, identical in both engines, and the
# bigint sum is order-independent.
def _micros(col: F.Column) -> F.Column:
    return F.floor(col * 1000000 + 0.5).cast("long")


_MICROS_SQL = "CAST(FLOOR({expr} * 1000000 + 0.5) AS BIGINT)"


@register(
    "q_mean_ratio",
    f"""
    SELECT CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice / l_quantity')}) AS DOUBLE)
           / 1000000 / COUNT(*) AS mean_ratio
    FROM lineitem
    """,
)
def q_mean_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratio = F.col("l_extendedprice") / F.col("l_quantity")
    return li.agg(
        (F.sum(_micros(ratio)).cast("double") / 1000000 / F.count(F.lit(1))).alias(
            "mean_ratio"
        )
    )


# Fused multi-column means in one pass (benchmarks/panda.py, BenchDemo.hs).
@register(
    "q_col_means",
    f"""
    SELECT CAST(SUM({_MICROS_SQL.format(expr='value')}) AS DOUBLE)
           / 1000000 / COUNT(value) AS mean_value,
           CAST(SUM({_MICROS_SQL.format(expr='user_id')}) AS DOUBLE)
           / 1000000 / COUNT(user_id) AS mean_user_id
    FROM events
    """,
)
def q_col_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def dmean(c):
        return (
            F.sum(_micros(F.col(c))).cast("double") / 1000000 / F.count(c)
        ).alias(f"mean_{c}")

    return ev.agg(dmean("value"), dmean("user_id"))


# filterFrame + rcast (InCore.hs:222, Exploration.hs:47): predicate and
# projection both push into the parquet scan.
@register(
    "q_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return core_ops.project(
        core_ops.filter_rows(
            li,
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05),
        ),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )


# rputField / frameCons (Rec.hs): derived column, per-row IEEE double
# arithmetic — bit-identical across engines, no decimal needed.
@register(
    "q_mutate",
    """
    SELECT o_orderkey, o_totalprice,
           o_totalprice * 0.9 AS discounted,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    """,
)
def q_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return core_ops.mutate(
        o.select("o_orderkey", "o_totalprice"),
        discounted=F.col("o_totalprice") * 0.9,
        size_class=F.when(F.col("o_totalprice") > 200000, F.lit("big")).otherwise(
            F.lit("small")
        ),
    )


# takeRows (Exploration.hs:120) — deterministic under a total order.
@register(
    "q_take",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    LIMIT 100
    """,
)
def q_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this corpus — the
    # order must be total or the boundary rows are engine-dependent.
    return core_ops.take_rows(
        li.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
        ),
        100,
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"],
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# dropRows (Exploration.hs:125).
@register(
    "q_drop",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    OFFSET 55000
    """,
)
def q_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return core_ops.drop_rows(
        li.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
        ),
        55000,
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"],
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# maximumBy (demo/Kata04.hs): row achieving the max, total-order tiebreak.
@register(
    "q_argmax",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    """,
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return agg_ops.argmax(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_totalprice",
        ["o_orderkey"],
    )


# Record equality / distinct (test/Overlap.hs idiom).
@register(
    "q_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# Sorted head (Ord row instances; TakeOrderedAndProject physical op).
@register(
    "q_sort",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return core_ops.take_rows(
        o.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        100,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )


# ---------------------------------------------------------------------------
# §2a Frames parity — joins (src/Frames/Joins.hs; benchmarks/pandas_joins.py)
# ---------------------------------------------------------------------------

def _order_stats(spark, sf_dir):
    """Per-customer order stats; the 'summary' side of the reference's
    left ⋈ left_summary joins (benchmarks/pandas_joins.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("spend"),
    )


_ORDER_STATS_SQL = """
    SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey
"""


# innerJoin (Joins.hs:56) — merged USING key. customer is SF-scaled,
# so the dim side stays UN-hinted: AQE broadcasts while it fits and
# demotes to shuffle at cluster scale (forced hints OOM instead).
@register(
    "q_join_inner",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = join_ops.inner_join(o, c, [("o_custkey", "c_custkey")])
    return joined.select(
        "o_custkey", "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# Multi-key join (Joins.hs composite fs; pandas_joins.py on
# ("policyID","county")): fact joined to its own 2-key summary.
@register(
    "q_join_multi",
    """
    WITH summary AS (
      SELECT l_orderkey, l_partkey, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS group_qty
      FROM lineitem GROUP BY l_orderkey, l_partkey
    )
    SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, s.n_lines, s.group_qty
    FROM lineitem l JOIN summary s
      ON l.l_orderkey = s.l_orderkey AND l.l_partkey = s.l_partkey
    WHERE l.l_orderkey % 7 = 0
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_orderkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("group_qty"),
    )
    joined = join_ops.inner_join(li, summary, ["l_orderkey", "l_partkey"])
    return joined.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey", "l_partkey", "l_linenumber", "n_lines", "group_qty"
    )


# leftJoin (Joins.hs:223): right-side columns become Maybe (nullable).
@register(
    "q_join_left",
    f"""
    SELECT c_custkey, c_name, n_orders, spend
    FROM customer LEFT JOIN ({_ORDER_STATS_SQL}) USING (c_custkey)
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return join_ops.left_join(c, _order_stats(spark, sf_dir), ["c_custkey"]).select(
        "c_custkey", "c_name", "n_orders", "spend"
    )


# rightJoin (Joins.hs:169).
@register(
    "q_join_right",
    f"""
    SELECT c_custkey, c_name, n_orders, spend
    FROM ({_ORDER_STATS_SQL}) RIGHT JOIN customer USING (c_custkey)
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return join_ops.right_join(_order_stats(spark, sf_dir), c, ["c_custkey"]).select(
        "c_custkey", "c_name", "n_orders", "spend"
    )


# outerJoin (Joins.hs:112): both sides null-extendable, coalesced key.
@register(
    "q_join_outer",
    f"""
    WITH building AS (
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT c_custkey, c_name, n_orders, spend
    FROM building FULL JOIN ({_ORDER_STATS_SQL}) USING (c_custkey)
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    return join_ops.outer_join(building, _order_stats(spark, sf_dir), ["c_custkey"])


# Membership filters — semi/anti ship only keys, never payload.
@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return join_ops.semi_join(
        c.select("c_custkey", "c_name", "c_acctbal"),
        o.filter(F.col("o_totalprice") > 300000),
        [("c_custkey", "o_custkey")],
    )


@register(
    "q_anti_join",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return join_ops.anti_join(
        c.select("c_custkey", "c_name", "c_acctbal"),
        o.filter(F.col("o_orderpriority") == "1-URGENT"),
        [("c_custkey", "o_custkey")],
    )


# ---------------------------------------------------------------------------
# §2a Frames parity — reshape / categorical / missing / zip
# ---------------------------------------------------------------------------

# melt wide→long (src/Frames/Melt.hs:104): narrow per-row expansion,
# no shuffle — unpivot happens inside the scan's stage.
_MELT_VALUES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

@register(
    "q_melt",
    " UNION ALL ".join(
        f"""
        SELECT l_orderkey, l_linenumber, '{v}' AS variable,
               CAST({v} AS DOUBLE) AS value
        FROM lineitem WHERE l_orderkey % 10 = 0
        """
        for v in _MELT_VALUES
    ),
)
def q_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return melt_ops.melt(li, ["l_orderkey", "l_linenumber"], _MELT_VALUES)


# pivot long→wide (inverse of melt; explicit value list, no discovery
# scan). Cell agg is an exact decimal sum cast back to double.
@register(
    "q_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = melt_ops.pivot(
        li,
        ["l_returnflag"],
        "l_linestatus",
        ["O", "F"],
        F.sum(F.col("l_quantity").cast("decimal(18,6)")),
    )
    return piv.select(
        "l_returnflag",
        F.col("O").cast("double").alias("O"),
        F.col("F").cast("double").alias("F"),
    )


# declareCategorical (src/Frames/Categorical.hs:66): category set with
# stable dense codes.
@register(
    "q_categorical",
    """
    SELECT category, CAST(DENSE_RANK() OVER (ORDER BY category) - 1 AS BIGINT) AS code
    FROM (SELECT DISTINCT o_orderpriority AS category FROM orders)
    """,
)
def q_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cats = cat_ops.categories(o, "o_orderpriority")
    return cats.select("category", F.col("code").cast("long").alias("code"))


# Default-fill over Maybe columns (demo/MissingData.hs): nulls from a
# left join filled with per-column defaults.
@register(
    "q_missing_fill",
    f"""
    SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders,
           COALESCE(spend, 0.0) AS spend
    FROM customer LEFT JOIN ({_ORDER_STATS_SQL}) USING (c_custkey)
    """,
)
def q_missing_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    joined = join_ops.left_join(c, _order_stats(spark, sf_dir), ["c_custkey"])
    filled = missing_ops.fill_defaults(joined, {"n_orders": 0, "spend": 0.0})
    return filled.select("c_custkey", "n_orders", "spend")


# Keep-missing filter (test/UncurryFoldPartialData.hs: the reference
# blanks `prestige` where type=NA, keeps rows where it failed to
# parse, and projects `income`). Here: blank c_acctbal where negative,
# keep the now-missing rows, project the remaining columns.
@register(
    "q_missing_drop",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM (SELECT *, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
          FROM customer)
    WHERE bal IS NULL
    """,
)
def q_missing_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    maybe = missing_ops.with_nulls(
        c.withColumn("bal", F.col("c_acctbal")), "bal", F.col("c_acctbal") < 0
    )
    return missing_ops.keep_missing(maybe, "bal").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# zipFrames positional concat (src/Frames/Frame.hs:68) — requires an
# explicit total order per side (see operators/core.py scale note).
@register(
    "q_zip_frames",
    """
    WITH lhs AS (
      SELECT c_custkey, c_name,
             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ), rhs AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM lhs JOIN rhs USING (rn) WHERE rn <= 200
    """,
)
def q_zip_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    lhs = core_ops.take_rows(
        c.select("c_custkey", "c_name", "c_acctbal"),
        200,
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
    )
    rhs = core_ops.take_rows(
        o.select("o_orderkey", "o_totalprice"),
        200,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return core_ops.zip_frames(
        lhs,
        rhs,
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# §2b Window / analytic operators (operators/window.py)
# ---------------------------------------------------------------------------

# Top-k per group: per-segment top 3 orders.
@register(
    "q_topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rank_in_group AS BIGINT) AS rank_in_group
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_group
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rank_in_group <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # customer is SF-scaled: un-hinted join, AQE sizes the broadcast.
    joined = join_ops.inner_join(o, c, [("o_custkey", "c_custkey")])
    top = win_ops.topk_per_group(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )
    return top.withColumn("rank_in_group", F.col("rank_in_group").cast("long"))


# Running sum per supplier over ship order (decimal-exact prefix sums).
@register(
    "q_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber,
                               l_partkey, l_suppkey, l_quantity
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 20
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    run = win_ops.running_sum(
        li,
        ["l_suppkey"],
        ["l_shipdate", "l_orderkey", "l_linenumber",
         "l_partkey", "l_suppkey", "l_quantity"],
        F.col("l_quantity").cast("decimal(18,6)"),
        alias="running_qty",
    )
    return run.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("running_qty").cast("double").alias("running_qty"),
    )


# Gap-based sessionization (batch twin of streaming session_window).
@register(
    "q_sessionize",
    """
    SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR date_diff('second',
                                      CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP),
                                      CAST(ts AS TIMESTAMP)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = win_ops.sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    return sess.select("event_id", "user_id", "session_id")


# Tumbling-window rollup on the event stream (batch form; the
# streaming twin lives in frames_spark/streaming/events.py).
@register(
    "q_events_window",
    f"""
    SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_MICROS_SQL.format(expr='value')}) AS DOUBLE) / 1000000 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_micros(F.col("value"))).cast("double") / 1000000).alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# §2b Text analysis (frames_spark/functions/text.py)
# ---------------------------------------------------------------------------

from frames_spark.dedup import cluster as cluster_ops  # noqa: E402
from frames_spark.dedup import embedding as embed_ops  # noqa: E402
from frames_spark.dedup import exact as exact_ops  # noqa: E402
from frames_spark.dedup import jaccard as jac_ops  # noqa: E402
from frames_spark.dedup import minhash as mh_ops  # noqa: E402
from frames_spark.dedup import simhash as simh_ops  # noqa: E402
from frames_spark.functions import text as text_fns  # noqa: E402
from frames_spark.functions.hashing import hash60_sql  # noqa: E402
from frames_spark.similarity import ann as ann_ops  # noqa: E402

# Shared SQL fragments: normalized text and its whitespace tokens.
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS_SQL = f"string_split({_NORM_SQL}, ' ')"


# Length/token/punctuation/stopword quality metrics — one scan.
@register(
    "q_text_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_raw,
           len({_TOKENS_SQL}) AS n_tokens,
           CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST(length(replace({_NORM_SQL}, ' ', '')) AS DOUBLE)
             / len({_TOKENS_SQL}) AS avg_token_len
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    norm = text_fns.normalize(text)
    ntok = text_fns.n_tokens(text)
    return docs.select(
        "doc_id",
        F.length(text).cast("long").alias("n_chars_raw"),
        ntok.cast("long").alias("n_tokens"),
        text_fns.punct_ratio(text).alias("punct_ratio"),
        (
            F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast("double")
            / ntok
        ).alias("avg_token_len"),
    )


# Stopword-hit language-ID scoring (functions/text.py LANG_STOPWORDS):
# per-language marker-token counts + argmax prediction. The pipeline is
# the real operator; swap bigger lists / a Pandas-UDF model at will.
def _lang_case(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in text_fns.LANG_STOPWORDS[lang])
    # CAST: DuckDB SUM(int) yields HUGEINT; Spark emits BIGINT and the
    # driver's value hash is type-sensitive, so pin the oracle to BIGINT.
    return f"CAST(SUM(CASE WHEN tok IN ({toks}) THEN 1 ELSE 0 END) AS BIGINT) AS score_{lang}"


@register(
    "q_langid",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
    ), scores AS (
      SELECT doc_id, {", ".join(_lang_case(lang) for lang in ["en", "de", "fr", "es", "zh"])}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, score_en, score_de, score_fr, score_es, score_zh,
           CASE WHEN score_en >= score_de AND score_en >= score_fr
                     AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                WHEN score_de >= score_fr AND score_de >= score_es
                     AND score_de >= score_zh THEN 'de'
                WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
                WHEN score_es >= score_zh THEN 'es'
                ELSE 'zh' END AS predicted
    FROM scores
    """,
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.langid import language_scores

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    return language_scores(docs, "doc_id", "text")


# Document fingerprint: md5 of normalized text (portable, SURVEY §4).
@register(
    "q_fingerprint",
    f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", text_fns.fingerprint(F.col("text")).alias("fp"))


# BPE-ish token estimate: regex token classes; ~4 chars per BPE token.
@register(
    "q_tokens_bpe",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all({_NORM_SQL}, '{text_fns.TOKEN_REGEX}')) AS tok
      FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_regex_tokens,
           CAST(SUM(CAST(ceil(length(tok) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_tokens
    FROM toks GROUP BY doc_id
    """,
)
def q_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pure scan expressions — no explode, no per-token shuffle
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = text_fns.regex_tokens(text_fns.normalize(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_regex_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# §2b Deduplication (frames_spark/dedup/*)
#
# The synthetic corpus has no natural duplicates, so each dedup query
# plants them deterministically (same derivation in Spark and SQL):
# exact copies / drop-last-word near-copies / one-component-perturbed
# embeddings, ids offset by 1_000_000.
# ---------------------------------------------------------------------------

_DUP_OFFSET = 1_000_000


def _with_exact_copies(docs: DataFrame) -> DataFrame:
    copies = docs.select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionAll(copies)


_EXACT_CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + {_DUP_OFFSET} AS doc_id, text FROM documents
"""


def _with_near_copies(docs: DataFrame) -> DataFrame:
    toks = text_fns.tokens(F.col("text"))
    clipped = F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ")
    copies = docs.select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), clipped.alias("text")
    )
    return docs.select("doc_id", "text").unionAll(copies)


_NEAR_CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_DUP_OFFSET} AS doc_id,
           array_to_string(list_slice({_TOKENS_SQL}, 1, len({_TOKENS_SQL}) - 1), ' ') AS text
    FROM documents
"""

# Distinct word-trigram shingles of a (doc_id, text) relation, in SQL.
_SHINGLES_SQL = """
    SELECT DISTINCT doc_id AS doc,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, {tokens} AS toks FROM ({corpus}))
"""

# Stop-shingle guard shared by every posting-list dedup oracle:
# jaccard.py drops shingles with document frequency above this BEFORE
# pair generation (bounding posting lists and pair fan-out), and each
# oracle mirrors it with a HAVING df <= guard CTE.
_SHINGLE_MAX_DF = jac_ops.DEFAULT_MAX_DF


# Exact dedup: md5-fingerprint groupBy (dedup/exact.py).
@register(
    "q_dedup_exact",
    f"""
    SELECT md5({_NORM_SQL}) AS fp, MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM ({_EXACT_CORPUS_SQL}) GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_ops.exact_dedup_groups(
        _with_exact_copies(docs), "doc_id", "text"
    ).select("fp", "canonical_id", "n_copies")


# N-gram Jaccard near-dup pairs via shingle inverted index, with the
# default stop-shingle guard mirrored in the oracle's `rare` CTE.
@register(
    "q_dedup_ngram",
    f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    shingled0 AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM corpus")}),
    rare AS (
      SELECT shingle FROM shingled0 GROUP BY shingle
      HAVING COUNT(*) <= {_SHINGLE_MAX_DF}
    ),
    shingled AS (SELECT s.* FROM shingled0 s JOIN rare USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM shingled GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
      FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE)
             / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc
    JOIN sizes sb ON doc_b = sb.doc
    WHERE CAST(n_common AS DOUBLE)
          / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.6
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jac_ops.jaccard_pairs(
        _with_near_copies(docs), "doc_id", "text", n=3, threshold=0.6
    )


# MinHash signatures + banded LSH candidates (dedup/minhash.py).
_MH_K, _MH_BANDS, _MH_ROWS = 8, 4, 2

# Candidate-pair SQL (doc_a, doc_b), reused as the edge list of the
# clustering oracle below. Nested WITH so it stays one self-contained
# subquery. The CTE prefix is shared with the accuracy eval, which
# additionally needs `sigs` and `shingled` in scope.
_MH_CTES = f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    shingled AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM corpus")}),
    hashed AS (
      SELECT doc, {hash60_sql("shingle", seed="mh")} % {mh_ops.MINHASH_P} AS base
      FROM shingled
    ),
    sigs AS (
      SELECT doc,
             {", ".join(f"MIN(({a} * base + {b}) % {mh_ops.MINHASH_P}) AS sig_{i}" for i, (a, b) in enumerate(mh_ops._mix_consts(i) for i in range(_MH_K)))}
      FROM hashed GROUP BY doc
    ),
    banded AS (
      {" UNION ALL ".join(f"SELECT doc, {band} AS band, " + " || ',' || ".join(f"CAST(sig_{band * _MH_ROWS + r} AS VARCHAR)" for r in range(_MH_ROWS)) + " AS band_key FROM sigs" for band in range(_MH_BANDS))}
    )
"""

_MH_PAIRS_SELECT = """
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
"""

_MINHASH_PAIRS_SQL = _MH_CTES + _MH_PAIRS_SELECT


@register("q_dedup_minhash", _MINHASH_PAIRS_SQL)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = mh_ops.minhash_signatures(
        _with_near_copies(docs), "doc_id", "text", n=3, num_hashes=_MH_K
    )
    return mh_ops.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)


# Duplicate CLUSTERS from the minhash pairs: connected components by
# min-label propagation (dedup/cluster.py). The oracle computes the
# same fixpoint as a recursive CTE (min reachable node id); the
# Spark side iterates joins with lineage truncation. Output is one
# row per edge-involved doc: its component = smallest doc id in its
# duplicate group (the canonical survivor).
@register(
    "q_dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_MINHASH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = mh_ops.minhash_signatures(
        _with_near_copies(docs), "doc_id", "text", n=3, num_hashes=_MH_K
    )
    pairs = mh_ops.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)
    return cluster_ops.connected_components(pairs, "doc_a", "doc_b")


# SimHash 60-bit fingerprints (dedup/simhash.py).
@register(
    "q_dedup_simhash",
    f"""
    WITH shingled AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT doc_id, text FROM documents")}),
    hashed AS (
      SELECT doc, {hash60_sql("shingle", seed="sh")} AS h FROM shingled
    ),
    votes AS (
      SELECT doc, b.bit, SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
      FROM hashed, range(0, 60) b(bit) GROUP BY doc, b.bit
    )
    SELECT doc, CAST(SUM(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simh_ops.simhash(docs, "doc_id", "text")


# Embedding-cosine near-dup pairs, fixed-point exact (dedup/embedding.py).
def _emb_corpus_sql(where: str = "") -> str:
    return f"""
    SELECT vec_id, embedding FROM embeddings {where}
    UNION ALL
    SELECT vec_id + {_DUP_OFFSET} AS vec_id,
           list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
                          x -> CASE WHEN x[2] = 1
                                    THEN CAST(x[1] AS FLOAT) + CAST(0.125 AS FLOAT)
                                    ELSE CAST(x[1] AS FLOAT) END) AS embedding
    FROM embeddings {where}
"""


_EMB_CORPUS_SQL = _emb_corpus_sql()


def _with_perturbed_copies(emb: DataFrame) -> DataFrame:
    perturbed = F.transform(
        F.arrays_zip(
            F.col("embedding"),
            F.sequence(F.lit(1), F.size("embedding")),
        ),
        lambda x: F.when(
            x["1"] == 1,
            (x["embedding"].cast("float") + F.lit(0.125).cast("float")).cast("float"),
        ).otherwise(x["embedding"].cast("float")),
    )
    copies = emb.select(
        (F.col("vec_id") + _DUP_OFFSET).alias("vec_id"),
        perturbed.alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionAll(copies)


_FIXED_SQL = """
    SELECT vec_id, i,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS e
    FROM ({corpus}), range(1, 65) t(i)
"""


def _emb_exact_oracle(corpus_sql: str) -> str:
    """All-pairs exact threshold-cosine SQL over ``corpus_sql`` —
    the reference semantics LSH approximates."""
    return f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus=corpus_sql)}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.e * b.e) AS dot
      FROM fixed a JOIN fixed b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT id_a, id_b,
             CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
    )
    SELECT id_a, id_b, cosine FROM cos WHERE cosine >= 0.9
    """


# Faithful LSH oracle: the planes are deterministic md5-derived ±1
# constants (embedding.plane_components), so the DuckDB twin
# reproduces the sign buckets bit-for-bit from a generated VALUES
# literal (planes x 64 dims), bands via ordered string_agg, the same
# max_bucket guard, and the same exact fixed-point cosine verify.
# Because the oracle models the EXACT candidate generation the Spark
# side runs — including band misses and max_bucket drops — the gate
# is deterministic under data regeneration, where an all-pairs
# oracle against a probabilistic plan has a ~4e-6/pair flake budget
# (ADVICE r3). Exactness vs the all-pairs semantics is witnessed
# quantitatively by q_embed_lsh_recall instead.
def _lsh_planes_values(total_planes: int) -> str:
    return ",".join(
        f"({p},{i + 1},{c})"
        for p in range(total_planes)
        for i, c in enumerate(embed_ops.plane_components(p, 64))
    )


def _emb_lsh_oracle(
    num_planes: int, num_tables: int, max_bucket: int, corpus_sql: str
) -> str:
    return f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus=corpus_sql)}),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(num_planes * num_tables)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    banded AS (
      SELECT vec_id, p // {num_planes} AS tbl,
             string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id, p // {num_planes}
    ),
    ok_buckets AS (
      SELECT tbl, bucket FROM banded
      GROUP BY tbl, bucket HAVING COUNT(*) BETWEEN 2 AND {max_bucket}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a
      JOIN ok_buckets ob ON a.tbl = ob.tbl AND a.bucket = ob.bucket
      JOIN banded b ON b.tbl = a.tbl AND b.bucket = a.bucket
                   AND a.vec_id < b.vec_id
    ),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT id_a, id_b, SUM(a.e * b.e) AS dot
      FROM cand
      JOIN fixed a ON a.vec_id = id_a
      JOIN fixed b ON b.vec_id = id_b AND b.i = a.i
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.9
"""


@register("q_dedup_embed", _emb_lsh_oracle(4, 16, 4000, _EMB_CORPUS_SQL))
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BUCKETED path: hyperplane-LSH candidates, exact fixed-point
    # cosine inside buckets; the O(n^2) all-pairs form never appears
    # in an execution plan. Short 4-plane bands x 16 tables: per-band
    # collision at the 0.9 threshold is (1 - acos(0.9)/pi)^4 ~ 0.54,
    # so 16 independent bands give ~0.99999 per-pair recall at the
    # decision boundary (and ~1.0 for the near-identical copies dedup
    # actually targets). The oracle models THIS candidate generation
    # bit-for-bit (see _emb_lsh_oracle), so the gate cannot flake on
    # a boundary miss after a data regeneration; recall vs the exact
    # all-pairs semantics is measured by q_embed_lsh_recall.
    emb = load_table(spark, sf_dir, "embeddings")
    return embed_ops.near_dup_pairs_lsh(
        _with_perturbed_copies(emb), "vec_id", "embedding",
        threshold=0.9, num_planes=4, num_tables=16, max_bucket=4000,
    )


@register("q_dedup_embed_lsh", _emb_lsh_oracle(8, 4, 2000, _EMB_CORPUS_SQL))
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embed_ops.near_dup_pairs_lsh(
        _with_perturbed_copies(emb), "vec_id", "embedding",
        threshold=0.9, num_planes=8, num_tables=4, max_bucket=2000,
    )


# sf0.1-feasible witness for q_dedup_embed: the SAME operator with the
# SAME parameters (4 planes x 16 tables, the configuration whose
# full-corpus oracle is quadratic-in-bucket and so excluded from the
# 10x sweep) over a deterministic vec_id < 2000 subset + perturbed
# copies — the subset keeps the oracle's in-bucket expansion bounded
# at EVERY scale factor, so the dual-SF sweep covers this
# configuration with no exclusions.
_EMB_SMALL_SQL = _emb_corpus_sql("WHERE vec_id < 2000")


@register("q_dedup_embed_small", _emb_lsh_oracle(4, 16, 4000, _EMB_SMALL_SQL))
def q_dedup_embed_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    return embed_ops.near_dup_pairs_lsh(
        _with_perturbed_copies(emb), "vec_id", "embedding",
        threshold=0.9, num_planes=4, num_tables=16, max_bucket=4000,
    )


# Quantitative recall witness for the LSH dedup path: on a fixed
# deterministic subset (vec_id < 200 plus their perturbed copies),
# compare the LSH pair set against the EXACT all-pairs threshold
# cosine and report recall. Both sides are modeled in the oracle —
# the exact side as the all-pairs join, the LSH side bit-for-bit —
# so the metric itself is deterministic and driver-checkable. The
# subset all-pairs join is a broadcast nested-loop over ~400 rows by
# construction: this is the witness query, not the scale path.
_EMB_SUBSET_SQL = _emb_corpus_sql("WHERE vec_id < 200")


@register(
    "q_embed_lsh_recall",
    f"""
    WITH exact AS ({_emb_exact_oracle(_EMB_SUBSET_SQL)}),
    lsh AS (
      SELECT id_a, id_b FROM ({_emb_lsh_oracle(4, 16, 4000, _EMB_SUBSET_SQL)})
    )
    SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM exact JOIN lsh USING (id_a, id_b)) AS n_found,
           CAST((SELECT COUNT(*) FROM exact JOIN lsh USING (id_a, id_b)) AS DOUBLE)
             / (SELECT COUNT(*) FROM exact) AS recall
    """,
)
def q_embed_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    subset = _with_perturbed_copies(emb)
    exact = embed_ops.cosine_pairs(subset, "vec_id", "embedding", 0.9)
    lsh = embed_ops.near_dup_pairs_lsh(
        subset, "vec_id", "embedding",
        threshold=0.9, num_planes=4, num_tables=16, max_bucket=4000,
    )
    found = exact.join(lsh.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return n_exact.crossJoin(F.broadcast(n_found)).select(
        "n_exact",
        "n_found",
        (F.col("n_found").cast("double") / F.col("n_exact").cast("double")).alias(
            "recall"
        ),
    )


# ---------------------------------------------------------------------------
# §2b Similarity search (frames_spark/similarity/ann.py)
# ---------------------------------------------------------------------------

_ANN_BF_ORACLE = f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 3
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@register("q_ann_bruteforce", _ANN_BF_ORACLE)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ops.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", k=5
    )


# Bucketed ANN scale path. Full SQL oracle (same deterministic-plane
# reproduction as q_dedup_embed_lsh): queries probe only their own
# sign bucket, exact fixed-point cosine ranks within it.
_ANN_PLANES_VALUES = ",".join(
    f"({p},{i + 1},{c})"
    for p in range(4)
    for i, c in enumerate(embed_ops.plane_components(p, 64))
)

_ANN_LSH_ORACLE = f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    planes(p, i, c) AS (VALUES {_ANN_PLANES_VALUES}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    buckets AS (
      SELECT vec_id, string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
    ),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT query_id, neighbor_id, SUM(a.e * b.e) AS dot
      FROM pairs
      JOIN fixed a ON a.vec_id = query_id
      JOIN fixed b ON b.vec_id = neighbor_id AND b.i = a.i
      GROUP BY query_id, neighbor_id
    ),
    cos AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      FROM dots
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM cos
    ) ranked WHERE rn <= 5
"""


@register("q_ann_lsh", _ANN_LSH_ORACLE)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ops.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding",
        k=5, num_planes=4,
    )


# ---------------------------------------------------------------------------
# §2b More OLAP coverage: as-of join, cube/rollup, distinct counts,
# quantiles
# ---------------------------------------------------------------------------

from frames_spark.operators.asof import asof_join  # noqa: E402


# As-of join: attach each 'click' event's latest preceding 'purchase'
# value per user. Spark lacks a native as-of join; operators/asof.py
# is the one-shuffle union-window formulation.
@register(
    "q_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id,
           (SELECT r.value FROM r
            WHERE r.user_id = l.user_id AND r.ts <= l.ts
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS last_purchase_value
    FROM l
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), "user_id", "ts",
        F.col("value").alias("last_purchase_value"),
    )
    out = asof_join(
        left.withColumnRenamed("event_id", "l_event_id"),
        right,
        key="user_id",
        ts="ts",
        value_cols=["last_purchase_value"],
        right_tiebreak="r_event_id",
    )
    return out.select(
        F.col("l_event_id").alias("event_id"), "user_id", "last_purchase_value"
    )


# CUBE: all grouping-set totals (Frames has no native cube; standard
# OLAP surface for this engine). NULL marks the rolled-up dimension.
@register(
    "q_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias(
            "sum_qty"
        ),
    )


@register(
    "q_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias(
            "spend"
        ),
    )


# Exact distinct counts (the portable twin of approx_count_distinct —
# see q_approx_distinct below for the sketch used at 100 TB).
@register(
    "q_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# HLL sketch distinct — rows-only (sketch estimates are
# engine-specific by design); the exact twin above is the oracle.
@register("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx")
    )


# Quantiles over integer micro-units: identical sort + identical
# linear-interpolation arithmetic on both engines (the raw-double
# version risks ulp drift in (1-f)*a + f*b; micros make a and b exact
# integers so the expression is bit-stable).
@register(
    "q_quantiles",
    f"""
    SELECT o_orderpriority,
           quantile_cont({_MICROS_SQL.format(expr='o_totalprice')}, 0.5) / 1000000 AS p50,
           quantile_cont({_MICROS_SQL.format(expr='o_totalprice')}, 0.9) / 1000000 AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    micros = _micros(F.col("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        (F.percentile(micros, F.lit(0.5)) / 1000000).alias("p50"),
        (F.percentile(micros, F.lit(0.9)) / 1000000).alias("p90"),
    )


# Sketch quantiles for the 100 TB path — rows-only by design.
@register("q_approx_quantiles")
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        )
    )


# Range join: every purchase within 1 hour after a click by the same
# user. operators/rangejoin.py turns the non-equi range condition into
# a bucketed equi-join (one shuffle, 2x right amplification) instead
# of a per-key product.
from frames_spark.operators.rangejoin import range_join  # noqa: E402


@register(
    "q_range_join",
    """
    SELECT l.event_id AS click_id, l.user_id,
           r.event_id AS purchase_id, r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = range_join(
        clicks, purchases, key="user_id",
        left_ts="click_ts", right_ts="purchase_ts", window_seconds=3600,
    )
    return out.select("click_id", "user_id", "purchase_id", "purchase_value")


# IVF ANN — k-means coarse quantizer, probe nprobe cells per query.
# Rows-only: centroid training is iterative (not SQL-expressible);
# tests/test_ivf.py pins recall against the exact search and checks
# full-probe == brute-force exactly.
@register("q_ann_ivf")
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding",
        k=5, n_centroids=8, nprobe=3,
    )


# IVF at FULL probe: with nprobe == n_centroids every cell is
# searched, so the result is the exact top-k regardless of how the
# (iterative, seeded) quantizer trained — which is exactly why THIS
# variant can carry the brute-force SQL oracle while the nprobe<K
# row above stays rows-only. The driver now witnesses the whole IVF
# code path (train -> assign -> probe -> score) end-to-end.
@register("q_ann_ivf_fullprobe", _ANN_BF_ORACLE)
def q_ann_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding",
        k=5, n_centroids=8, nprobe=8,
    )


# Quantitative witness for the nprobe<K probing path (the row the
# fullprobe twin can't cover): recall@5 vs the exact brute-force
# top-5 over the fixed query subset, PROFILED across nprobe — one
# row per nprobe in {1,3,5,8}, each a ratio of exact integer counts.
# Rows-only by design (centroids come from iterative seeded k-means,
# not SQL-expressible), but the VALUES are deterministic (seeded fit
# over a hash-ordered training cap) and tests/test_ivf.py pins the
# profile: monotone non-decreasing in nprobe, exactly 1.0 at full
# probe. Note the synthetic near-uniform embeddings are IVF's worst
# case — neighbors scatter across cells, so partial-probe recall
# (~0.73 at 3/8) is structurally lower than on real clustered
# embedding corpora; the profile shape, not one point, is the pin.
@register("q_ann_ivf_recall")
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.ivf import build_ivf, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = (
        ann_ops.brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
        .select("query_id", "neighbor_id")
        .persist()  # tiny (|queries| x 5); reused by every nprobe branch
    )
    assigned, centroids = build_ivf(emb, "vec_id", "embedding", n_centroids=8)
    assigned = assigned.persist()  # one quantizer pass feeds all probes
    parts = []
    for nprobe in (1, 3, 5, 8):
        ivf = ivf_search(
            assigned, centroids, queries, "vec_id", "embedding", k=5, nprobe=nprobe
        ).select("query_id", "neighbor_id")
        found = exact.join(ivf, ["query_id", "neighbor_id"], "left_semi")
        n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
        n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
        parts.append(
            n_exact.crossJoin(F.broadcast(n_found)).select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                "n_exact",
                "n_found",
                (
                    F.col("n_found").cast("double") / F.col("n_exact").cast("double")
                ).alias("recall_at_5"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Training-corpus cleaning pipeline (pipelines/pretrain.py): quality
# gate -> language gate -> exact dedup -> minhash near-dup drop, as
# one lazy plan with an exact end-to-end SQL oracle.
# ---------------------------------------------------------------------------

_PUNCT_SQL = (
    "CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
    " / greatest(length(text), 1)"
)

_PIPELINE_ORACLE = f"""
    WITH quality AS (
      SELECT doc_id, text FROM documents
      WHERE len({_TOKENS_SQL}) >= 10 AND {_PUNCT_SQL} <= 0.2
    ),
    toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM quality
    ),
    scores AS (
      SELECT doc_id, {", ".join(_lang_case(lang) for lang in ["en", "de", "fr", "es", "zh"])}
      FROM toks GROUP BY doc_id
    ),
    lang AS (
      SELECT doc_id FROM scores
      WHERE score_en >= score_de AND score_en >= score_fr
        AND score_en >= score_es AND score_en >= score_zh
    ),
    gated AS (
      SELECT q.* FROM quality q WHERE q.doc_id IN (SELECT doc_id FROM lang)
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5({_NORM_SQL})
    ),
    uniq AS (
      SELECT g.* FROM gated g WHERE g.doc_id IN (SELECT doc_id FROM canon)
    ),
    shingled AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM uniq")}),
    hashed AS (
      SELECT doc, {hash60_sql("shingle", seed="mh")} % {mh_ops.MINHASH_P} AS base
      FROM shingled
    ),
    sigs AS (
      SELECT doc,
             {", ".join(f"MIN(({a} * base + {b}) % {mh_ops.MINHASH_P}) AS sig_{i}" for i, (a, b) in enumerate(mh_ops._mix_consts(i) for i in range(_MH_K)))}
      FROM hashed GROUP BY doc
    ),
    banded AS (
      {" UNION ALL ".join(f"SELECT doc, {band} AS band, " + " || ',' || ".join(f"CAST(sig_{band * _MH_ROWS + r} AS VARCHAR)" for r in range(_MH_ROWS)) + " AS band_key FROM sigs" for band in range(_MH_BANDS))}
    ),
    dropped AS (
      SELECT DISTINCT b.doc AS doc_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
    )
    SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens
    FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


_PIPELINE_CC_ORACLE = _PIPELINE_ORACLE.replace(
    "WITH quality AS", "WITH RECURSIVE quality AS"
).replace(
    """    dropped AS (
      SELECT DISTINCT b.doc AS doc_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
    )""",
    """    pairs AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    dropped AS (SELECT node AS doc_id FROM comp WHERE node <> component)""",
)
assert "RECURSIVE" in _PIPELINE_CC_ORACLE and "reach" in _PIPELINE_CC_ORACLE


# Transitive-dedup variant: connected components over the candidate
# pairs, keep each cluster's min doc id (pipelines/pretrain.py
# clean_corpus_cc). Greedy pair-drop keeps members that never appear
# as a pair's higher id; the component view collapses whole chains.
@register("q_pipeline_clean_cc", _PIPELINE_CC_ORACLE)
def q_pipeline_clean_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.pipelines.pretrain import clean_corpus_cc

    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus_cc(
        docs, min_tokens=10, max_punct=0.2, lang="en",
        shingle_n=3, num_hashes=_MH_K, bands=_MH_BANDS,
        rows_per_band=_MH_ROWS,
    )


@register("q_pipeline_clean", _PIPELINE_ORACLE)
def q_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.pipelines.pretrain import clean_corpus

    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus(
        docs, min_tokens=10, max_punct=0.2, lang="en",
        shingle_n=3, num_hashes=_MH_K, bands=_MH_BANDS,
        rows_per_band=_MH_ROWS,
    )


# JSON column extraction: typed from_json over the events.props
# payload (the semi-structured column every event pipeline carries).
# Catalyst prunes the parse to the single referenced field.
@register(
    "q_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(props->>'k' AS BIGINT)) AS n_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k LONG").getField("k")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k")
    )


# Time-range window: per-user rolling 1-hour revenue (RANGE frame over
# event time, not row count). Micros keep the in-frame float sum exact
# on both engines.
@register(
    "q_running_sum_time",
    f"""
    SELECT event_id, user_id,
           CAST(SUM({_MICROS_SQL.format(expr='value')}) OVER (
             PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000 AS rolling_value
    FROM events
    """,
)
def q_running_sum_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # order the RANGE frame by integer MICROSECONDS on both engines:
    # unix_timestamp() truncates to whole seconds while DuckDB's
    # epoch() keeps fractions, so boundary events ~3600s apart joined
    # the frame on one engine only (caught at sf0.1 density)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600000000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(_micros(F.col("value"))).over(w).cast("double") / 1000000).alias(
            "rolling_value"
        ),
    )


# GROUPING SETS — the general form of cube/rollup: exactly the
# requested grouping combinations, one pass, partial agg map-side.
@register(
    "q_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count(F.lit(1)).alias("n"))


# Pearson correlation from EXACT integer moment sums: micros-scaled
# values accumulate as DECIMAL(38,0) (order-independent), and the
# final corr is one float expression over those exact sums — the
# same arithmetic in both engines, so it is bit-stable. A bare
# corr() would drift in the last ulps with partition order.
@register(
    "q_corr",
    f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST({_MICROS_SQL.format(expr='l_quantity')} AS HUGEINT) AS x,
             CAST({_MICROS_SQL.format(expr='l_extendedprice')} AS HUGEINT) AS y
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM m GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0) AS corr_qty_price
    FROM s
    """,
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = _micros(F.col("l_quantity")).cast("decimal(18,0)")
    y = _micros(F.col("l_extendedprice")).cast("decimal(18,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # nullif-guarded: a constant or single-row group has a zero
    # denominator, which ANSI mode turns into a runtime error rather
    # than an IEEE inf — corr is NULL there on both engines.
    denom = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    corr = (d("n") * d("sxy") - d("sx") * d("sy")) / F.nullif(denom, F.lit(0.0))
    return s.select("l_returnflag", corr.alias("corr_qty_price"))


# Decile assignment per group — ntile over a total order.
@register(
    "q_ntile",
    """
    SELECT o_orderkey,
           NTILE(10) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-phase ranking (operators/ranking.py): a direct
    # `ntile() OVER (PARTITION BY o_orderpriority ...)` caps
    # parallelism at the 5 distinct priorities — each task would sort
    # 1/5 of the fact table at any cluster size. The strict
    # (o_totalprice, o_orderkey) order makes NTILE pure arithmetic on
    # an exact distributed rank.
    o = load_table(spark, sf_dir, "orders")
    ranked = grouped_rank(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
    )
    return ranked.select(
        "o_orderkey",
        ntile_from_rank(F.col("rn"), F.col("group_cnt"), 10).alias("decile"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splitting (operators/sampling.py).
# Membership is a content-hash predicate: pure scan-stage filter, no
# shuffle, reproducible on any partitioning or engine — unlike
# df.sample(), which changes with physical layout.
# ---------------------------------------------------------------------------

from frames_spark.operators import sampling as sample_ops  # noqa: E402


@register(
    "q_sample_hash",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE {sample_ops.hash_sample_sql("o_orderkey", 0.05, seed="smp")}
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return sample_ops.hash_sample(o, "o_orderkey", 0.05, seed="smp").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "q_train_test_split",
    f"""
    SELECT CASE WHEN {sample_ops.hash_sample_sql("doc_id", 0.1, seed="split")}
                THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_ops.train_test_split(docs, "doc_id", 0.1, seed="split")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_STRATA_FRACS = {"AUTOMOBILE": 0.5, "BUILDING": 0.1, "MACHINERY": 0.02}


@register(
    "q_sample_stratified",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE {sample_ops.stratified_hash_sample_sql("c_mktsegment", "c_custkey",
                                                 _STRATA_FRACS, 0.01, seed="st")}
    GROUP BY c_mktsegment
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        sample_ops.stratified_hash_sample(
            c, "c_mktsegment", "c_custkey", _STRATA_FRACS, 0.01, seed="st"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-table join + grouped revenue + top-k. The segment
# filter prunes customer BEFORE the join (predicate pushdown), the
# pruned customer side broadcasts, and only orders x lineitem shuffles
# on the join key. Revenue in micros for a bit-stable top-10 order.
# ---------------------------------------------------------------------------


@register(
    "q_top_unshipped",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')})
                AS DOUBLE) / 1000000 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        join_ops.dim_join(orders, cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / 1000000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Inter-event gaps: lag over (user, time) — the Frames idiom of a
# stateful fold over ordered rows, as one window pass + one agg.
# Gap sums stay integer microseconds end-to-end; the mean is one
# float division over exact ints (bit-stable both engines).
# ---------------------------------------------------------------------------


@register(
    "q_user_gaps",
    """
    WITH d AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / NULLIF(COUNT(gap_us), 0) / 1000000
             AS mean_gap_s
    FROM d GROUP BY user_id
    """,
)
def q_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    n = F.count("gap_us")
    return gaps.groupBy("user_id").agg(
        n.alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.nullif(n, F.lit(0)) / 1000000).alias(
            "mean_gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# Per-group mode (most frequent value): two-level aggregate — count per
# (group, value) shuffles once on the composite key, then the argmax is
# a window over the (small) distinct-pair set. Deterministic tie-break
# by value. Frames ref: fold-built frequency maps (Exploration.hs).
# ---------------------------------------------------------------------------


@register(
    "q_mode",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event, n FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rk
      FROM c
    ) WHERE rk = 1
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "n")
    )


# ---------------------------------------------------------------------------
# Corpus statistics: corpus-wide top tokens and per-doc TF-IDF.
# Both are explode-then-aggregate shapes — the shuffle key is the
# token, partial aggregation combines map-side, and the result set
# is vocabulary-sized (tiny next to the corpus).
# ---------------------------------------------------------------------------

_NORM_WS_SPARK = None  # tokens: lowercase, whitespace-normalized, split on ' '


def _tokens_col() -> "F.Column":
    return F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ")


_TOKENS_SQL = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"


@register(
    "q_top_tokens",
    f"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens_col()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


# Per-doc top TF-IDF term WITHOUT floats: ranking by (tf DESC, df ASC,
# term ASC) is order-equivalent to tf/df scoring for fixed tf and
# avoids cross-engine libm drift in log(); the integers themselves are
# exact on both engines.
@register(
    "q_tfidf",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token <> '' GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
      WHERE token <> '' GROUP BY token
    )
    SELECT doc_id, token AS top_term, tf, df FROM (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rk
      FROM tf JOIN df USING (token)
    ) WHERE rk = 1
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(_tokens_col()).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), "token")
    return (
        tf.join(df, "token")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "tf", "df")
    )


# Token-repetition ratio: a Gopher-style quality signal. Integer
# counts; the ratio is one float division over exact ints.
@register(
    "q_repetition",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter({_TOKENS_SQL}, x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           1 - CAST(len(list_distinct(toks)) AS DOUBLE)
               / NULLIF(len(toks), 0) AS repetition
    FROM t
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens_col(), lambda x: x != "")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        (1 - nd.cast("double") / F.nullif(n, F.lit(0))).alias("repetition"),
    )


# ---------------------------------------------------------------------------
# Outlier flagging: per-type z-score from EXACT integer moment sums
# (same technique as q_corr). The tiny per-type stats table broadcasts
# back onto the stream — never a window over a whole event_type
# partition, which would put one hot type on one executor.
# ---------------------------------------------------------------------------


@register(
    "q_zscore",
    f"""
    WITH m AS (
      SELECT event_type, event_id,
             CAST({_MICROS_SQL.format(expr='value')} AS HUGEINT) AS v
      FROM events
    ), s AS (
      SELECT event_type, COUNT(*) AS n, SUM(v) AS sv, SUM(v*v) AS svv
      FROM m GROUP BY event_type
    )
    SELECT m.event_id,
           (CAST(m.v AS DOUBLE) - CAST(s.sv AS DOUBLE) / s.n)
           / NULLIF(sqrt(CAST(s.svv AS DOUBLE) / s.n
                    - (CAST(s.sv AS DOUBLE) / s.n) * (CAST(s.sv AS DOUBLE) / s.n)), 0)
             AS z,
           ABS((CAST(m.v AS DOUBLE) - CAST(s.sv AS DOUBLE) / s.n))
           > 2 * sqrt(CAST(s.svv AS DOUBLE) / s.n
                      - (CAST(s.sv AS DOUBLE) / s.n) * (CAST(s.sv AS DOUBLE) / s.n))
             AS is_outlier
    FROM m JOIN s USING (event_type)
    """,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type", "event_id", _micros(F.col("value")).cast("decimal(38,0)").alias("v")
    )
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("sv") / F.col("n")
    var = d("svv") / F.col("n") - mean * mean
    std = F.sqrt(var)
    z = (d("v") - mean) / F.nullif(std, F.lit(0.0))
    return (
        m.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            z.alias("z"),
            (F.abs(d("v") - mean) > 2 * std).alias("is_outlier"),
        )
    )


# Fixed-bound histogram: integer bucket ids from one scan — the
# 100 TB-safe histogram (no sort, no sketch needed for fixed bounds).
@register(
    "q_histogram",
    """
    SELECT LEAST(GREATEST(CAST(FLOOR(value / 25) AS BIGINT), 0), 19) AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 25).cast("long"), F.lit(0)), F.lit(19)
    )
    return ev.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


# Set algebra over keyed row sets (Frames' Rec equality idiom):
# urgent-but-never-low customers (EXCEPT), both-priorities customers
# (INTERSECT) — tagged and unioned into one result.
@register(
    "q_set_ops",
    """
    WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         l AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
    SELECT 'urgent_only' AS op, o_custkey FROM (SELECT * FROM u EXCEPT SELECT * FROM l)
    UNION ALL
    SELECT 'both' AS op, o_custkey FROM (SELECT * FROM u INTERSECT SELECT * FROM l)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    return (
        u.exceptAll(low).select(F.lit("urgent_only").alias("op"), "o_custkey")
        .unionAll(low.intersect(u).select(F.lit("both").alias("op"), "o_custkey"))
    )


# Distribution position per row: cume_dist and percent_rank share the
# same closed-form definitions in every engine (counts over counts),
# so the doubles are bit-stable.
@register(
    "q_cume_dist",
    """
    SELECT o_orderkey,
           cume_dist() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS cd,
           percent_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS pr
    FROM orders
    """,
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same two-phase ranking rationale as q_ntile: under the strict
    # (o_totalprice, o_orderkey) order, cume_dist = rn/cnt and
    # percent_rank = (rn-1)/(cnt-1) exactly.
    o = load_table(spark, sf_dir, "orders")
    ranked = grouped_rank(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
    )
    cnt = F.col("group_cnt")
    rn = F.col("rn")
    return ranked.select(
        "o_orderkey",
        (rn.cast("double") / cnt.cast("double")).alias("cd"),
        F.when(cnt == 1, F.lit(0.0))
        .otherwise((rn - 1).cast("double") / (cnt - 1).cast("double"))
        .alias("pr"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/expectations.py): violation
# queries an ingest pipeline gates on. Profile is one full-scan agg
# for ALL columns together; orphan checks are key-only anti-joins.
# ---------------------------------------------------------------------------

from frames_spark.operators import expectations as exp_ops  # noqa: E402


@register(
    "q_profile",
    """
    SELECT 'o_custkey' AS column, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice)
    FROM orders
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return exp_ops.profile(o, ["o_custkey", "o_orderstatus", "o_totalprice"])


@register(
    "q_check_unique",
    """
    SELECT o_custkey, COUNT(*) AS n_rows FROM orders
    GROUP BY o_custkey HAVING COUNT(*) > 1
    """,
)
def q_check_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exp_ops.duplicate_keys(load_table(spark, sf_dir, "orders"), ["o_custkey"])


# The testdata has full referential integrity, so the check runs
# against the URGENT-order subset to produce actual violations
# (customers with no urgent order) — same plan shape as a true FK
# check: key-only distinct + broadcast anti-join.
@register(
    "q_check_orphans",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_check_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return exp_ops.orphans(c, "c_custkey", o, "o_custkey").select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation shapes (Q4/Q13/Q15/Q17/Q18/Q22). Correlated
# subqueries re-expressed as the join shapes Catalyst would
# decorrelate them to — written directly so the plan is explicit:
# EXISTS -> semi join with residual condition, scalar-per-group
# subquery -> pre-aggregated join, scalar-global subquery -> 1-row
# broadcast, NOT EXISTS -> anti join. All money/qty math in exact
# integers (micros / bigint) so both engines hash identically.
# ---------------------------------------------------------------------------


# Q4 shape: orders with at least one late-shipped line (EXISTS with a
# correlated non-equi predicate). Semi join keeps the orders payload
# out of the shuffle; lineitem ships only (orderkey, shipdate).
@register(
    "q_late_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# Q13 shape: customer order-count distribution. The left join is
# replaced by a fact-side pre-aggregation (orders collapse to one row
# per customer BEFORE touching the customer table) + coalesce(0) for
# customers with no match — same result, |orders| -> |customers|
# join input.
@register(
    "q_cust_order_dist",
    """
    SELECT n_orders, COUNT(*) AS n_custs FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY n_orders
    """,
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .join(per_cust, "c_custkey", "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )


# Q15 shape: supplier(s) with the maximum revenue — a global scalar
# subquery. The scalar max is a 1-row aggregate broadcast back onto
# the per-supplier revenue (equi-join on the value); Spark reuses the
# rev exchange for both branches instead of scanning lineitem twice.
@register(
    "q_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS rev_micros
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_micros
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_micros = (SELECT MAX(rev_micros) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_micros"
        )
    )
    mx = rev.agg(F.max("rev_micros").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["rev_micros"] == mx["__mx"])
        .join(sup, rev["l_suppkey"] == sup["s_suppkey"])
        .select("s_suppkey", "s_name", "rev_micros")
    )


# Q17 shape: lines below 20% of their part's average quantity — a
# correlated scalar aggregate per group. Decorrelated: per-part
# (sum, count) pre-agg joined back on partkey; the 0.2*avg compare
# becomes exact integer math (5*qty*n < sum). The small-part filter
# broadcasts and prunes lineitem before the per-part join.
@register(
    "q_small_qty_revenue",
    f"""
    WITH pa AS (
      SELECT l_partkey AS pa_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             COUNT(*) AS n_li
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice')}) AS BIGINT) AS rev_micros,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN pa   ON pa_partkey = l_partkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 5
      AND 5 * CAST(l_quantity AS BIGINT) * n_li < sum_qty
    GROUP BY p_brand
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    return (
        join_ops.dim_join(li, small_parts, li["l_partkey"] == small_parts["p_partkey"])
        .join(pa, li["l_partkey"] == pa["pa_partkey"])
        .filter(
            5 * F.col("l_quantity").cast("long") * F.col("n_li") < F.col("sum_qty")
        )
        .groupBy("p_brand")
        .agg(
            F.sum(_micros(F.col("l_extendedprice"))).alias("rev_micros"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# Q18 shape: large-volume orders (HAVING over a fact pre-agg, then
# dims attached). The qty sum happens on lineitem alone — the join
# fan-in is only the ~0.1% of orders that survive the HAVING.
@register(
    "q_big_orders",
    """
    SELECT c_name, o_orderkey, o_orderdate, sum_qty
    FROM (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 270
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 270)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_name", "o_orderkey", "o_orderdate", "sum_qty")
    )


# Q22 shape: above-average-balance customers with no recent orders.
# Global scalar subquery -> 1-row broadcast compared in exact cents
# (bal*n > sum); NOT EXISTS -> anti join on the pruned recent-order
# key set.
@register(
    "q_rich_inactive",
    f"""
    WITH stats AS (
      SELECT SUM({_MICROS_SQL.format(expr='c_acctbal')}) AS sum_micros,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey, c_acctbal
    FROM customer, stats
    WHERE {_MICROS_SQL.format(expr='c_acctbal')} * n > sum_micros
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """,
)
def q_rich_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_micros(F.col("c_acctbal"))).alias("sum_micros"),
        F.count(F.lit(1)).alias("n"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(_micros(F.col("c_acctbal")) * F.col("n") > F.col("sum_micros"))
        .join(F.broadcast(recent), "c_custkey", "left_anti")
        .select("c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Ordered event funnel (operators/funnel.py): first-touch
# view -> click -> purchase. Step k = min event time strictly after
# the user's step k-1 time; every shuffle keyed by user so the
# exchange layout is reused down the chain.
# ---------------------------------------------------------------------------

from frames_spark.operators import funnel as funnel_ops  # noqa: E402

_FUNNEL_STAGES_SQL = """
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS step_0_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, MIN(ts) AS step_1_ts
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE event_type = 'click' AND ts > step_0_ts
      GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(ts) AS step_2_ts
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'purchase' AND ts > step_1_ts
      GROUP BY e.user_id
    ),
    stages AS (
      SELECT s0.user_id, step_0_ts, step_1_ts, step_2_ts
      FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
              LEFT JOIN s2 ON s0.user_id = s2.user_id
    )
"""


@register(
    "q_funnel_stages",
    _FUNNEL_STAGES_SQL + "SELECT * FROM stages",
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_ops.funnel_stages(ev, ["view", "click", "purchase"])


@register(
    "q_funnel_counts",
    _FUNNEL_STAGES_SQL
    + """
    SELECT 0 AS step_idx, 'view' AS step, COUNT(step_0_ts) AS n_users FROM stages
    UNION ALL
    SELECT 1, 'click', COUNT(step_1_ts) FROM stages
    UNION ALL
    SELECT 2, 'purchase', COUNT(step_2_ts) FROM stages
    """,
)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_ops.funnel_counts(ev, ["view", "click", "purchase"])


# Per-group OLS fit y = intercept + slope*x (x=quantity, y=price):
# same exact-DECIMAL moment sums as q_corr, then slope/intercept as
# one float expression each — identical arithmetic both engines, so
# bit-stable. regr_slope()/regr_intercept() would drift with
# partition order like bare corr().
@register(
    "q_regression",
    f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST({_MICROS_SQL.format(expr='l_quantity')} AS HUGEINT) AS x,
             CAST({_MICROS_SQL.format(expr='l_extendedprice')} AS HUGEINT) AS y
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx
      FROM m GROUP BY l_returnflag
    ), fit AS (
      SELECT l_returnflag, n, sx, sy,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope
      FROM s
    )
    SELECT l_returnflag, slope,
           (CAST(sy AS DOUBLE) / 1000000 - slope * (CAST(sx AS DOUBLE) / 1000000)) / CAST(n AS DOUBLE) AS intercept
    FROM fit
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = _micros(F.col("l_quantity")).cast("decimal(18,0)")
    y = _micros(F.col("l_extendedprice")).cast("decimal(18,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / F.nullif(
        d("n") * d("sxx") - d("sx") * d("sx"), F.lit(0.0)
    )
    fit = s.select("l_returnflag", "n", "sx", "sy", slope.alias("slope"))
    intercept = (
        d("sy") / F.lit(1000000.0) - F.col("slope") * (d("sx") / F.lit(1000000.0))
    ) / d("n")
    return fit.select("l_returnflag", "slope", intercept.alias("intercept"))


# Per-group dispersion from the same exact moments: population
# variance/stddev over micros-scaled values, one float expression at
# the end (stddev_pop() drifts with partition order).
@register(
    "q_group_stats",
    f"""
    WITH m AS (
      SELECT o_orderpriority,
             CAST({_MICROS_SQL.format(expr='o_totalprice')} AS HUGEINT) AS x
      FROM orders
    ), s AS (
      SELECT o_orderpriority, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
      FROM m GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           / 1000000000000 AS var_price,
           sqrt((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                / 1000000000000) AS std_price
    FROM s
    """,
)
def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = _micros(F.col("o_totalprice")).cast("decimal(18,0)")
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (
        d("sxx") / d("n") - (d("sx") / d("n")) * (d("sx") / d("n"))
    ) / F.lit(1000000000000.0)
    return s.select(
        "o_orderpriority", "n", var.alias("var_price"), F.sqrt(var).alias("std_price")
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids (similarity/centroid.py): posexplode
# -> one (label, pos) aggregate with exact integer-micros sums, one
# float division at the end. Long form so the hash compare sees
# scalars.
# ---------------------------------------------------------------------------

from frames_spark.operators.rangejoin import interval_concurrency  # noqa: E402
from frames_spark.operators.sampling import (  # noqa: E402
    _race_key_sql,
    weighted_sample,
)
from frames_spark.similarity import centroid as centroid_ops  # noqa: E402


@register(
    "q_embed_centroids",
    """
    SELECT label, pos, CAST(SUM(vm) AS DOUBLE) / 1000000 / COUNT(*) AS mean
    FROM (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vm
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_ops.component_means(emb, "label")


# Deterministic weighted sampling without replacement (A-ES race,
# operators/sampling.py): P(select) ~ n_chars, reproducible on any
# partition layout, winners via one top-k. The float race key never
# leaves the plan (ranking only), so cross-engine ulp drift can't
# reach the hash compare.
@register(
    "q_weighted_sample",
    f"""
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars > 0
    ORDER BY {_race_key_sql("doc_id", "n_chars", seed="ws")} DESC, doc_id
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", k=100, seed="ws")


# Sweep-line concurrency: users active in the last 30 minutes at
# every change point. The oracle is the textbook single global
# running sum; the Spark side is the two-phase bucketed prefix sum
# (operators/rangejoin.py) — same numbers, no single-partition scan.
@register(
    "q_concurrency",
    """
    WITH iv AS (SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
    deltas AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ),
    per_t AS (SELECT t, SUM(d) AS net FROM deltas GROUP BY t)
    SELECT t, CAST(SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
    FROM per_t
    """,
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "ts", (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("te")
    )
    return interval_concurrency(ev, "ts", "te", bucket="day")


# ---------------------------------------------------------------------------
# SCD2 versioning, per-key EWMA, edit-distance-1 pairs.
# ---------------------------------------------------------------------------

from frames_spark.dedup.editdist import edit1_pairs  # noqa: E402
from frames_spark.operators.grouped import ewma_per_key  # noqa: E402
from frames_spark.operators.scd import scd2_collapse  # noqa: E402


# SCD type-2 dimension built from the order stream: one row per
# PRIORITY VERSION per customer with [valid_from, valid_to) ranges —
# lag to detect changes, lead to close intervals, one shuffle total
# (operators/scd.py).
@register(
    "q_scd2",
    """
    WITH flagged AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderpriority) AS prev,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderpriority) AS rn
      FROM orders
    ),
    vers AS (
      SELECT o_custkey, o_orderpriority, valid_from
      FROM flagged
      WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev
    )
    SELECT o_custkey, o_orderpriority, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY o_custkey
             ORDER BY valid_from, o_orderpriority) AS valid_to
    FROM vers
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate"
    )
    return scd2_collapse(o, "o_custkey", "o_orderdate", ["o_orderpriority"])


# Per-user EWMA of event values — order-dependent recursion (row t
# needs row t-1's OUTPUT), the one legitimate applyInPandas case
# (operators/grouped.py). Rows-only check: the recursion is not
# expressible in portable SQL; exactness vs pandas is pinned in
# tests/test_grouped_scd.py.
# Full oracle (upgraded from rows-only): pandas ewm(adjust=False)
# computes EXACTLY (1-a)*prev + a*x in IEEE doubles (verified
# bit-for-bit against the literal recurrence), and a recursive CTE
# replays the same operation sequence per key — order is total
# because (user_id, ts) has no ties in this data. If the driver's
# hash ever disagrees here, suspect FMA contraction differences
# first.
@register(
    "q_ewma",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    ),
    rec AS (
      SELECT user_id, ts, value, rn, value AS ewma FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.ts, b.value, b.rn,
             (1 - 0.3) * r.ewma + 0.3 * b.value
      FROM base b JOIN rec r ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, ts, value, ewma FROM rec
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ewma_per_key(ev, "user_id", "ts", "value", alpha=0.3)


# Edit-distance-1 token pairs via deletion neighborhoods (SymSpell
# shape, dedup/editdist.py): explode |s|+1 variants, one groupBy,
# in-bucket pair expansion, levenshtein verify.
@register(
    "q_typo_pairs",
    f"""
    WITH toks AS (
      SELECT unnest({_TOKENS_SQL}) AS t FROM documents
    ),
    vocab AS (
      -- corpus tokens plus planted single-deletion typos (synthetic
      -- vocab has no natural typos; this makes the 0-row case a test
      -- failure instead of a vacuous pass)
      SELECT DISTINCT s FROM (
        SELECT t AS s FROM toks WHERE len(t) >= 4
        UNION ALL
        SELECT substr(t, 2, len(t)) FROM toks WHERE len(t) >= 5
      )
    ),
    variants AS (
      SELECT DISTINCT s, variant FROM (
        SELECT s, unnest(list_prepend(s,
          list_transform(range(1, len(s) + 1),
                         i -> substr(s, 1, i - 1) || substr(s, i + 1, len(s))))
        ) AS variant
        FROM vocab
      )
    )
    SELECT DISTINCT v1.s AS a, v2.s AS b
    FROM variants v1 JOIN variants v2
      ON v1.variant = v2.variant AND v1.s < v2.s
    WHERE levenshtein(v1.s, v2.s) <= 1
    """,
)
def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
    typos = toks.filter(F.length("tok") >= 5).select(
        F.col("tok").substr(F.lit(2), F.length("tok")).alias("tok")
    )
    return edit1_pairs(toks.unionAll(typos), "tok", min_len=4, max_bucket=None)


# Winsorized per-group stats: clip at the group's [p05, p95] and
# aggregate the clipped values. Bounds are FLOORED to whole micros so
# the clip, the sum, and the clipped-row counts are all exact integer
# math — the winsorized mean is one float division at the end. Plan:
# bounds aggregate per group (tiny) broadcast back onto the fact.
@register(
    "q_winsorize",
    f"""
    WITH m AS (
      SELECT o_orderpriority, {_MICROS_SQL.format(expr='o_totalprice')} AS xm
      FROM orders
    ),
    b AS (
      SELECT o_orderpriority,
             CAST(FLOOR(quantile_cont(xm, 0.05)) AS BIGINT) AS lo,
             CAST(FLOOR(quantile_cont(xm, 0.95)) AS BIGINT) AS hi
      FROM m GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority,
           CAST(SUM(LEAST(GREATEST(xm, lo), hi)) AS BIGINT) AS wsum_micros,
           CAST(SUM(CASE WHEN xm < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN xm > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           CAST(SUM(LEAST(GREATEST(xm, lo), hi)) AS DOUBLE) / 1000000 / COUNT(*) AS wmean
    FROM m JOIN b ON m.o_orderpriority = b.o_orderpriority
    GROUP BY m.o_orderpriority
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.select("o_orderpriority", _micros(F.col("o_totalprice")).alias("xm"))
    b = m.groupBy("o_orderpriority").agg(
        F.floor(F.percentile(F.col("xm"), F.lit(0.05))).cast("long").alias("lo"),
        F.floor(F.percentile(F.col("xm"), F.lit(0.95))).cast("long").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("xm"), F.col("lo")), F.col("hi"))
    return (
        m.join(F.broadcast(b), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(clipped).alias("wsum_micros"),
            F.sum((F.col("xm") < F.col("lo")).cast("long")).alias("n_clip_lo"),
            F.sum((F.col("xm") > F.col("hi")).cast("long")).alias("n_clip_hi"),
            (
                F.sum(clipped).cast("double") / F.lit(1000000.0) / F.count(F.lit(1))
            ).alias("wmean"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention + chi-square independence — product-analytics
# staples from exact integer counts.
# ---------------------------------------------------------------------------


# Cohort retention: users grouped by first-activity week; cell
# (cohort, offset) = distinct users active offset weeks later. Two
# shuffles: first-seen agg per user, then the (cohort, offset)
# distinct count. The self-join the textbook SQL implies is replaced
# by attaching the cohort to each event via the per-user first-seen
# broadcast... at 100 TB the per-user table shuffles on user_id —
# the same key as the event agg, so AQE coalesces into one exchange
# chain.
@register(
    "q_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort,
                            CAST(date_trunc('week', e.ts) AS TIMESTAMP)) / 7 AS BIGINT) AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort")
    )
    offset = (
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
    ).cast("long")
    return (
        ev.join(first_seen, "user_id")
        .select("user_id", "cohort", offset.alias("week_offset"))
        .distinct()
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# Chi-square independence of two categoricals: contingency counts
# and margins are exact ints (one groupBy + window margins), the
# statistic is float arithmetic applied identically in both engines.
@register(
    "q_chi_square",
    """
    WITH joined AS (
      SELECT o_orderpriority AS a, c_mktsegment AS b
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cells AS (SELECT a, b, COUNT(*) AS n_ab FROM joined GROUP BY a, b),
    m AS (
      SELECT a, b, n_ab,
             SUM(n_ab) OVER (PARTITION BY a) AS n_a,
             SUM(n_ab) OVER (PARTITION BY b) AS n_b,
             SUM(n_ab) OVER () AS n
      FROM cells
    )
    SELECT CAST(SUM(CAST(FLOOR(
             (CAST(n_ab AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_ab AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS chi2,
           COUNT(*) AS n_cells
    FROM m
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        join_ops.dim_join(o, c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("o_orderpriority").alias("a"), F.col("c_mktsegment").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    m = cells.select(
        "a", "b", "n_ab",
        F.sum("n_ab").over(Window.partitionBy("a")).alias("n_a"),
        F.sum("n_ab").over(Window.partitionBy("b")).alias("n_b"),
        F.sum("n_ab").over(Window.partitionBy()).alias("n"),
    )
    expected = d("n_a") * d("n_b") / d("n")
    # each cell's term is bit-stable (pure float expr over exact
    # ints), but a float SUM over cells drifts with partition order —
    # quantize per-cell to integer micros and sum longs instead
    term = (d("n_ab") - expected) * (d("n_ab") - expected) / expected
    term_q = F.floor(term * 1000000 + 0.5).cast("long")
    return m.agg(
        (F.sum(term_q).cast("double") / 1000000).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
    )


# Robust outliers by MAD (median absolute deviation): per-group
# median and MAD over exact micros, flag |x - med| > 3 * MAD.
# Unlike the z-score gate (q_zscore), one wild value can't drag the
# threshold — the standard robust quality gate. Two grouped
# percentile passes (median, then MAD over the broadcast-joined
# deviations); all comparisons in exact integer micros.
@register(
    "q_mad_outliers",
    f"""
    WITH m AS (
      SELECT event_type, event_id,
             {_MICROS_SQL.format(expr='value')} AS xm
      FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(FLOOR(quantile_cont(xm, 0.5)) AS BIGINT) AS med
      FROM m GROUP BY event_type
    ),
    dev AS (
      SELECT m.event_type, event_id, xm, med, ABS(xm - med) AS ad
      FROM m JOIN med ON m.event_type = med.event_type
    ),
    mad AS (
      SELECT event_type,
             CAST(FLOOR(quantile_cont(ad, 0.5)) AS BIGINT) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, event_id,
           CAST(xm AS DOUBLE) / 1000000 AS value
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    WHERE ad > 3 * mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.select("event_type", "event_id", _micros(F.col("value")).alias("xm"))
    med = m.groupBy("event_type").agg(
        F.floor(F.percentile(F.col("xm"), F.lit(0.5))).cast("long").alias("med")
    )
    dev = m.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("xm") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.floor(F.percentile(F.col("ad"), F.lit(0.5))).cast("long").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") > 3 * F.col("mad"))
        .select(
            "event_type", "event_id",
            (F.col("xm").cast("double") / 1000000).alias("value"),
        )
    )


# Day-over-day revenue change: daily sums in exact micros, LAG for
# the previous day, pct change as one float division of exact ints.
@register(
    "q_day_over_day",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT) AS rev_micros
      FROM orders GROUP BY 1
    )
    SELECT day, rev_micros,
           LAG(rev_micros) OVER (ORDER BY day) AS prev_micros,
           CAST(rev_micros - LAG(rev_micros) OVER (ORDER BY day) AS DOUBLE)
             / NULLIF(CAST(LAG(rev_micros) OVER (ORDER BY day) AS DOUBLE), 0) AS pct_change
    FROM daily
    """,
)
def q_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    # one row per DAY — the global window is over the tiny aggregated
    # relation, not the fact table (the same two-level shape as the
    # bucketed prefix sum in interval_concurrency)
    w = Window.orderBy("day")
    prev = F.lag("rev_micros").over(w)
    return daily.select(
        "day", "rev_micros", prev.alias("prev_micros"),
        (
            (F.col("rev_micros") - prev).cast("double")
            / F.nullif(prev.cast("double"), F.lit(0.0))
        ).alias("pct_change"),
    )


# Gaps-and-islands: longest consecutive-day activity streak per
# user. island id = active_day - row_number (constant within a run
# of consecutive days); one distinct + two windows, all keyed by
# user.
@register(
    "q_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    islands AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, MAX(len) AS max_streak FROM streaks GROUP BY user_id
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    islands = days.withColumn("island", F.date_sub(F.col("d"), rn))
    return (
        islands.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("max_streak"))
    )


# TPC-H Q7 shape: revenue volume between nation pairs by year. The
# dim chain (nation -> customer / supplier) broadcasts; the only
# shuffles are the fact joins on their natural keys. Exercises the
# full star schema including region/nation.
@register(
    "q_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS volume_micros
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
    """,
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    # nation filter applied BEFORE joining: customer/supplier prune
    # to the two nations via a broadcast of the 25-row nation table
    # (schema-bounded), then join the facts UN-hinted — the pruned
    # dims still scale with SF, so AQE sizes those broadcasts
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("cust_nation"),
            )),
            "c_nationkey",
        )
        .select("c_custkey", "cust_nation")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )),
            "s_nationkey",
        )
        .select("s_suppkey", "supp_nation")
    )
    rev = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).alias("volume_micros"))
    )


# TPC-H Q2 shape: argmin per group with join-back — the supplier
# offering each part's minimum price. Pre-agg min per part (partial
# map-side), equi-join back on (part, price) — no window over the
# fact, no correlated subquery at runtime.
@register(
    "q_cheapest_supplier",
    f"""
    WITH px AS (
      SELECT l_partkey, l_suppkey,
             MIN({_MICROS_SQL.format(expr='l_extendedprice / l_quantity')}) AS unit_micros
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_micros) AS best_micros
      FROM px GROUP BY l_partkey
    )
    SELECT px.l_partkey, MIN(l_suppkey) AS best_suppkey, best_micros
    FROM px JOIN best
      ON px.l_partkey = best.l_partkey AND unit_micros = best_micros
    GROUP BY px.l_partkey, best_micros
    """,
)
def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unit = _micros(F.col("l_extendedprice") / F.col("l_quantity"))
    px = li.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("unit_micros"))
    best = px.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_micros").alias("best_micros")
    )
    return (
        px.join(
            best,
            (px["l_partkey"] == best["b_partkey"])
            & (px["unit_micros"] == best["best_micros"]),
        )
        .groupBy("l_partkey", "best_micros")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select("l_partkey", "best_suppkey", "best_micros")
    )


# CDC compaction: latest record per key (deterministic (ts, id)
# tie-break) — the upsert-merge read path for an append-only change
# log. One window keyed by the entity; at scale this is the
# compaction job that keeps a changelog queryable without a
# transactional table format.
@register(
    "q_latest_per_key",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


# Session-level rollup on top of sessionization: duration, event
# count, and revenue per (user, session). The session assignment is
# the same two-window pass as q_sessionize; the rollup adds ONE more
# aggregate on (user, session) — same partitioning key prefix, so
# the sort from the window carries into the agg.
@register(
    "q_session_stats",
    f"""
    WITH sess AS (
      SELECT event_id, user_id, ts, value, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT event_id, user_id, ts, value, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR date_diff('second',
                                      CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP),
                                      CAST(ts AS TIMESTAMP)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(date_diff('microsecond', MIN(CAST(ts AS TIMESTAMP)), MAX(CAST(ts AS TIMESTAMP))) AS BIGINT) AS duration_us,
           CAST(SUM({_MICROS_SQL.format(expr='value')}) AS BIGINT) AS value_micros,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = win_ops.sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    dur = (
        F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
    ).alias("duration_us")
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dur,
        F.sum(_micros(F.col("value"))).alias("value_micros"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
    )


# First/last value per group in one window pass — the "entry and
# exit state" idiom (first page, last page, net change).
@register(
    "q_first_last",
    """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           first_value(value) OVER w AS first_value,
           last_value(value)  OVER w AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
    ).distinct()


# ---------------------------------------------------------------------------
# Training-corpus mechanics: chunking, packing, decontamination
# (pipelines/chunking.py, dedup/contamination.py).
# ---------------------------------------------------------------------------

from frames_spark.dedup.contamination import contaminated_docs  # noqa: E402
from frames_spark.pipelines.chunking import chunk_text, pack_docs  # noqa: E402


# Overlapping ~50-token chunks, stride 40 — pure array expressions
# in the scan stage (tokenize once, sequence+slice; no token
# explode). Chunk text compared by md5 to keep compare rows small.
@register(
    "q_chunk_docs",
    f"""
    WITH chunked AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len({_TOKENS_SQL}), 1) + 1, 40),
               s -> {{'idx': CAST((s - 1) / 40 AS BIGINT),
                      'toks': list_slice({_TOKENS_SQL}, s, s + 49)}}
             )) AS c
      FROM documents
    )
    SELECT doc_id, c.idx AS chunk_idx,
           md5(array_to_string(c.toks, ' ')) AS chunk_fp,
           len(c.toks) AS n_chunk_tokens
    FROM chunked WHERE len(c.toks) > 0
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_text(docs, max_tokens=50, overlap=10)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5(F.col("chunk_text")).alias("chunk_fp"),
        "n_chunk_tokens",
    )


# Contiguous packing into 2048-token context windows per source
# shard: bin = floor(exclusive prefix token count / capacity), one
# window pass keyed by source — never a global cumsum.
@register(
    "q_pack_docs",
    """
    SELECT source, doc_id, n_tokens,
           CAST(FLOOR(prefix / 2048) AS BIGINT) AS bin,
           CAST(prefix % 2048 AS BIGINT) AS bin_offset
    FROM (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM (
        SELECT source, doc_id, len({tokens}) AS n_tokens FROM documents
      )
    )
    """.replace("{tokens}", _TOKENS_SQL),
)
def q_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "source", "doc_id",
        F.size(text_fns.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_docs(with_tokens, "source", "doc_id", "n_tokens", capacity=2048)


# Decontamination: corpus docs sharing >= 3 distinct word trigrams
# with a (pseudo) benchmark set — the benchmark shingle index
# broadcasts, the corpus never shuffles. (Production would use
# 8-13-grams; the synthetic corpus is too short for those to
# collide at all.)
@register(
    "q_decontaminate",
    f"""
    WITH corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
    ),
    bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 20
    ),
    corp_sh AS ({_SHINGLES_SQL.format(tokens="list_slice(" + _TOKENS_SQL + ", 1, len(" + _TOKENS_SQL + "))", corpus="SELECT * FROM corp")}),
    bench_sh AS ({_SHINGLES_SQL.format(tokens="list_slice(" + _TOKENS_SQL + ", 1, len(" + _TOKENS_SQL + "))", corpus="SELECT * FROM bench")})
    SELECT c.doc AS doc, b.doc AS bench_doc, COUNT(*) AS n_shared
    FROM corp_sh c JOIN bench_sh b ON c.shingle = b.shingle
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 20)
    bench = docs.filter(F.col("doc_id") < 20)
    return contaminated_docs(corpus, bench, n=3, min_shared=3)


# ---------------------------------------------------------------------------
# SQL surface parity: the SAME ANSI string runs through spark.sql()
# over registered views AND as the DuckDB oracle — no translation
# layer. Proves the engine is usable as a SQL endpoint, not only via
# the DataFrame API, and that the dialect subset used is genuinely
# portable.
# ---------------------------------------------------------------------------

from frames_spark.sources.tables import register_views  # noqa: E402

_ANSI_JOIN_SQL = """
    SELECT c_name, o_orderkey, o_orderdate, sum_qty
    FROM (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 270
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
"""

_ANSI_WINDOW_SQL = """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) latest WHERE rn = 1
"""


@register("q_sql_ansi_join", _ANSI_JOIN_SQL)
def q_sql_ansi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ANSI_JOIN_SQL)


@register("q_sql_ansi_window", _ANSI_WINDOW_SQL)
def q_sql_ansi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ANSI_WINDOW_SQL)


# TPC-H Q5 shape: revenue from LOCAL supply chains (customer and
# supplier in the same nation). The same-nation predicate is a join
# condition between two broadcast dims — the facts never see it
# until the final residual filter on the joined row.
@register(
    "q_local_volume",
    f"""
    SELECT n_name,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_micros
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        # customer/supplier scale with SF: un-hinted, AQE-sized joins;
        # nation (25 rows, schema-bounded) keeps the forced hint
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_micros"))
    )


# TPC-H Q10 shape: top customers by revenue from RETURNED items —
# returnflag filter prunes lineitem at the scan, then one shuffle
# per fact join, top-k at the end.
@register(
    "q_returned_revenue",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_micros
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue_micros DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    rev = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).alias("revenue_micros"))
        .orderBy(F.desc("revenue_micros"), "c_custkey")
        .limit(20)
    )


# Hopping (sliding) window rollup: 1-hour windows every 15 minutes —
# each event lands in 4 overlapping windows. Spark's window() emits
# the expansion natively; the oracle reproduces it by generating the
# 4 candidate starts per event.
@register(
    "q_hopping_window",
    """
    WITH expanded AS (
      -- integer-micros bucket math: epoch() is a DOUBLE whose 16th
      -- significant digit rounds the microseconds, which can flip
      -- membership exactly at a window edge; epoch_us is exact
      SELECT e.*, CAST(to_timestamp(s // 1000000) AS TIMESTAMP) AS w_start
      FROM (
        SELECT *, unnest(list_transform(range(0, 4),
          i -> (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000
               - i * 900000000)) AS s
        FROM events
      ) e
      WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= s
        AND epoch_us(CAST(ts AS TIMESTAMP)) < s + 3600000000
    )
    SELECT w_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS value_micros
    FROM expanded GROUP BY w_start, event_type
    """,
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_micros(F.col("value"))).alias("value_micros"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "value_micros")
    )


# Point-in-time (PIT) join against the SCD2 dimension: each event
# reads the customer's priority version valid AT THE EVENT TIME.
# Because SCD2 versions partition time (valid_to = next valid_from),
# the between-join the textbook writes is exactly an AS-OF join on
# valid_from — one shuffle via the union-window asof operator, no
# range join. Updates are deduped to one per (key, date) first so
# versions have strictly increasing valid_from (no empty intervals,
# no tie ambiguity).
@register(
    "q_scd2_pit",
    """
    WITH upd AS (
      SELECT o_custkey, o_orderpriority, o_orderdate FROM (
        SELECT o_custkey, o_orderpriority, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderpriority, o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 1
    ),
    flagged AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate) AS prev,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate) AS rn
      FROM upd
    ),
    vers AS (
      SELECT o_custkey, o_orderpriority, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY o_custkey ORDER BY valid_from) AS valid_to
      FROM flagged WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev
    )
    SELECT e.event_id, e.user_id, e.ts, v.o_orderpriority AS prio_at_event
    FROM events e LEFT JOIN vers v
      ON v.o_custkey = e.user_id
     AND v.valid_from <= e.ts
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    """,
)
def q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey", "o_orderdate").orderBy(
            "o_orderpriority", "o_orderkey"
        )
    )
    upd = (
        o.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderpriority", "o_orderdate")
    )
    vers = scd2_collapse(upd, "o_custkey", "o_orderdate", ["o_orderpriority"])
    dim = vers.select(
        F.col("o_custkey").alias("user_id"),
        F.col("valid_from").alias("ts"),
        F.col("o_orderpriority").alias("prio_at_event"),
    )
    # constant tiebreak: after the (key, date) dedup no two versions
    # share a valid_from, so ordering needs no real tie column
    dim = dim.withColumn("tb", F.lit(0))
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return asof_join(
        ev, dim, key="user_id", ts="ts",
        value_cols=["prio_at_event"], right_tiebreak="tb",
    ).select("event_id", "user_id", "ts", "prio_at_event")


# Total covered time per user: merge overlapping activity intervals
# (gaps-and-islands over [s, e) spans: island breaks where a span
# starts after the running max of previous ends), then sum island
# extents. All arithmetic in integer epoch-micros; every window
# keyed by user. The "device online time" op — naive sum of span
# lengths double-counts overlaps.
@register(
    "q_covered_time",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      FROM events
    ),
    runs AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM runs
    ),
    merged AS (
      SELECT user_id, island, MAX(e) - MIN(s) AS covered_us
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(SUM(covered_us) AS BIGINT) AS covered_us,
           COUNT(*) AS n_islands
    FROM merged GROUP BY user_id
    """,
)
def q_covered_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 1800000000).alias("e"),
    )
    wp = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    runs = iv.withColumn("prev_max_e", prev_max)
    new_island = (
        F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))
    ).cast("long")
    islands = runs.withColumn(
        "island",
        F.sum(new_island).over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("covered_us"))
        .groupBy("user_id")
        .agg(
            F.sum("covered_us").alias("covered_us"),
            F.count(F.lit(1)).alias("n_islands"),
        )
    )


# Stratified weighted sampling: k A-ES winners per market segment —
# the per-stratum window form of q_weighted_sample.
from frames_spark.operators.sampling import weighted_sample_stratified  # noqa: E402


@register(
    "q_weighted_stratified",
    f"""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY {_race_key_sql("c_custkey", "c_acctbal", seed="wst")} DESC,
                        c_custkey) AS rn
      FROM customer WHERE c_acctbal > 0
    ) WHERE rn <= 10
    """,
)
def q_weighted_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    return weighted_sample_stratified(
        c, "c_mktsegment", "c_custkey", "c_acctbal", k=10, seed="wst"
    )


# K-fold cross-validation assignment: fold = content hash % k —
# layout-invariant like all sampling here, and every entity keeps
# its fold across reruns and engines. Output is the fold size table
# (the assignment itself is a scan expression).
@register(
    "q_kfold",
    f"""
    SELECT {hash60_sql("CAST(c_custkey AS VARCHAR)", seed="fold")} % 5 AS fold,
           COUNT(*) AS n, CAST(SUM({_MICROS_SQL.format(expr='c_acctbal')}) AS BIGINT) AS bal_micros
    FROM customer GROUP BY 1
    """,
)
def q_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.hashing import hash60

    c = load_table(spark, sf_dir, "customer")
    fold = (hash60(F.col("c_custkey").cast("string"), seed="fold") % 5).alias("fold")
    return c.groupBy(fold).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("c_acctbal"))).alias("bal_micros"),
    )


# Abandonment: clicks with NO purchase by the same user within the
# following hour — the anti form of the range join (funnel breakage
# detail view). Purchase keys prune to (user, ts) before the anti
# join; the residual time bound rides on the join condition.
@register(
    "q_abandoned",
    """
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR
      )
    """,
)
def q_abandoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (clicks["user_id"] == purchases["p_user"])
        & (purchases["p_ts"] >= clicks["click_ts"])
        & (purchases["p_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(purchases, cond, "left_anti")


# Share-of-total: each segment's revenue share — the percent is a
# window over the ALREADY-AGGREGATED 5-row relation, never the fact
# table; exact micros ratio.
@register(
    "q_share_of_total",
    f"""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT) AS rev_micros
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, rev_micros,
           CAST(rev_micros AS DOUBLE) / CAST(SUM(rev_micros) OVER () AS DOUBLE) AS share
    FROM seg
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        join_ops.dim_join(o, c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    )
    total = F.sum("rev_micros").over(Window.partitionBy())
    return seg.select(
        "c_mktsegment", "rev_micros",
        (F.col("rev_micros").cast("double") / total.cast("double")).alias("share"),
    )


# PII redaction (functions/redact.py): plant synthetic emails/phones
# on a deterministic subset (the corpus has no natural PII), scrub,
# and account — counts + md5 of the scrubbed text, all one scan.
from frames_spark.functions import redact as redact_fns  # noqa: E402

_PII_CORPUS_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or +1-555-0' || CAST(doc_id % 100 AS VARCHAR) || '99'
                ELSE text END AS text
    FROM documents
"""


@register(
    "q_redact_pii",
    f"""
    SELECT doc_id, {", ".join(redact_fns.pii_counts_sql("text"))},
           md5({redact_fns.redact_sql("text")}) AS redacted_fp
    FROM ({_PII_CORPUS_SQL})
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-0"),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("99"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return planted.select(
        "doc_id",
        *redact_fns.pii_counts(F.col("text")),
        F.md5(redact_fns.redact(F.col("text"))).alias("redacted_fp"),
    )


# Table diff (operators/diff.py): one full-outer join on the keys
# with per-side scan-time row hashes. Diffed here: orders vs a
# modified snapshot (urgent orders re-priced, some dropped, some
# added) — the CI shape for pipeline-output regression testing.
from frames_spark.operators.diff import table_diff  # noqa: E402

_DIFF_B_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
"""


@register(
    "q_table_diff",
    f"""
    WITH b AS ({_DIFF_B_SQL})
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_totalprice <> b.o_totalprice
                  OR a.o_custkey <> b.o_custkey
                  OR a.o_orderstatus <> b.o_orderstatus
                  OR a.o_orderdate <> b.o_orderdate
                  OR a.o_orderpriority <> b.o_orderpriority THEN 'changed'
           END AS change
    FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_custkey <> b.o_custkey
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_orderdate <> b.o_orderdate
       OR a.o_orderpriority <> b.o_orderpriority
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    modified = o.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    added = o.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100000000
    )
    b = modified.unionByName(added)
    return table_diff(o, b, ["o_orderkey"])


# Shannon entropy of the event-type mix per user — distribution
# skew/diversity metric from exact counts. p*log2(p) terms are the
# same float expression over exact ints on both engines, quantized
# to micros before the final sum (partition-order-proof, the
# chi-square lesson).
@register(
    "q_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events
      GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, event_type, n, SUM(n) OVER (PARTITION BY user_id) AS total
      FROM c
    )
    SELECT user_id,
           CAST(SUM(CAST(FLOOR(
             -(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
              * log2(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000 + 0.5
           ) AS BIGINT)) AS DOUBLE) / 1000000 AS entropy,
           COUNT(*) AS n_types
    FROM t GROUP BY user_id
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.withColumn("total", F.sum("n").over(Window.partitionBy("user_id")))
    p = F.col("n").cast("double") / F.col("total").cast("double")
    term_q = F.floor(-p * F.log2(p) * 1000000 + 0.5).cast("long")
    return t.groupBy("user_id").agg(
        (F.sum(term_q).cast("double") / 1000000).alias("entropy"),
        F.count(F.lit(1)).alias("n_types"),
    )


# Association rules over user "baskets" (event types performed):
# support / confidence / lift from exact counts. Baskets gather with
# one groupBy + sorted collect_set; the i<j pair expansion happens
# IN-ARRAY (the minhash/LSH idiom) so there is no self-join of the
# distinct-pairs relation; all ratios are one float expression over
# exact longs.
@register(
    "q_assoc_rules",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT COUNT(DISTINCT user_id) AS nu FROM ut),
    item AS (SELECT event_type, COUNT(*) AS n_item FROM ut GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS n_pair
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                        AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ante, cons, n_pair,
           CAST(n_pair AS DOUBLE) / nu AS support,
           CAST(n_pair AS DOUBLE) / ia.n_item AS confidence,
           CAST(n_pair AS DOUBLE) / ia.n_item / ic.n_item * nu AS lift
    FROM pair
    JOIN item ia ON ante = ia.event_type
    JOIN item ic ON cons = ic.event_type
    CROSS JOIN n_users
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    baskets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("items")
    )
    pairs_expr = F.expr(
        "flatten(transform(items, (x, i) ->"
        " transform(slice(items, i + 2, size(items)),"
        " y -> struct(x AS ante, y AS cons))))"
    )
    pair = (
        baskets.select(F.explode(pairs_expr).alias("p"))
        .groupBy(F.col("p.ante").alias("ante"), F.col("p.cons").alias("cons"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    item = ut.groupBy(F.col("event_type").alias("ante")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    # n_users as a 1-row aggregate broadcast into the plan (the same
    # CROSS JOIN n_users the oracle uses) — no driver-side .count()
    # job, no synchronization barrier, one lazy plan end-to-end.
    nu_df = ut.agg(F.count_distinct("user_id").alias("_nu"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    out = (
        pair.join(F.broadcast(item), "ante")
        .join(
            F.broadcast(item.select(F.col("ante").alias("cons"),
                                    F.col("n_item").alias("n_cons"))),
            "cons",
        )
        .crossJoin(F.broadcast(nu_df))
        .select(
            "ante", "cons", "n_pair",
            (d("n_pair") / d("_nu")).alias("support"),
            (d("n_pair") / d("n_item")).alias("confidence"),
            (d("n_pair") / d("n_item") / d("n_cons") * d("_nu")).alias("lift"),
        )
    )
    return out


# Time-to-convert distribution: percentiles of (purchase - first
# view) over converted users — funnel stages composed with the
# bit-stable micros percentile. One extra tiny aggregate over the
# per-user stage table.
@register(
    "q_conversion_time",
    _FUNNEL_STAGES_SQL
    + """
    SELECT COUNT(*) AS n_converted,
           CAST(FLOOR(quantile_cont(dt_us, 0.5)) AS BIGINT) AS p50_us,
           CAST(FLOOR(quantile_cont(dt_us, 0.9)) AS BIGINT) AS p90_us
    FROM (
      SELECT epoch_us(CAST(step_2_ts AS TIMESTAMP))
             - epoch_us(CAST(step_0_ts AS TIMESTAMP)) AS dt_us
      FROM stages WHERE step_2_ts IS NOT NULL
    )
    """,
)
def q_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stages = funnel_ops.funnel_stages(ev, ["view", "click", "purchase"])
    dt = (
        F.unix_micros(F.col("step_2_ts")) - F.unix_micros(F.col("step_0_ts"))
    ).alias("dt_us")
    return (
        stages.filter(F.col("step_2_ts").isNotNull())
        .select(dt)
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.floor(F.percentile(F.col("dt_us"), F.lit(0.5))).cast("long").alias("p50_us"),
            F.floor(F.percentile(F.col("dt_us"), F.lit(0.9))).cast("long").alias("p90_us"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H plan-shape extensions (Q8/Q12/Q14/Q16/Q19/Q20/Q21 adapted to
# the columns this star schema carries — no partsupp, no shipmode, no
# commit/receipt dates). Each exercises a distinct physical shape:
# conditional aggregation over a star join, delay bucketing, distinct
# counting with an exclusion anti-join, OR-of-ANDs pushdown, and
# fact-side pre-aggregation feeding a tiny dimension join.
# ---------------------------------------------------------------------------


# TPC-H Q8 shape: market share of one supplier nation per year within
# a consumer region. All five dims broadcast; the fact table shuffles
# once for the aggregate. Share = double division of two exact
# integer-micros sums (bit-stable across engines).
@register(
    "q_market_share",
    f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                         THEN {_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}
                         ELSE 0 END) AS BIGINT) AS nation_micros,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS total_micros,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                         THEN {_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'EUROPE'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = load_table(spark, sf_dir, "supplier")
    # customer-side nation chain prunes to one region BEFORE broadcast
    cn = (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == F.col("cn_key"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), supp["s_nationkey"] == F.col("sn_key"))
    )
    is_n1 = F.col("supp_nation") == "NATION_1"
    return (
        joined.select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.when(is_n1, vol).otherwise(F.lit(0)).alias("nv"),
            vol.alias("tv"),
        )
        .groupBy("o_year")
        .agg(
            F.sum("nv").alias("nation_micros"),
            F.sum("tv").alias("total_micros"),
            (
                F.sum("nv").cast("double") / F.sum("tv").cast("double")
            ).alias("mkt_share"),
        )
    )


# TPC-H Q12 shape: order-priority mix by shipping-delay bucket.
# One fact-fact join keyed on the order key, then a conditional
# aggregate over a handful of buckets — partial agg map-side.
@register(
    "q_ship_delay",
    """
    SELECT LEAST(date_diff('day', CAST(o_orderdate AS TIMESTAMP),
                           CAST(l_shipdate AS TIMESTAMP)) // 30, 6) AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY 1
    """,
)
def q_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.least(
        F.floor(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 30),
        F.lit(6),
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            bucket.alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("h"),
            F.when(high, 0).otherwise(1).alias("l"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("h").cast("long").alias("n_high"),
            F.sum("l").cast("long").alias("n_low"),
        )
    )


# TPC-H Q14 shape: promo revenue share per month — conditional
# aggregate over one broadcast dim join; share from exact ints.
@register(
    "q_promo_share",
    f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN {_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}
                         ELSE 0 END) AS BIGINT) AS promo_micros,
           CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS total_micros
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    vol = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
            F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)).alias("pv"),
            vol.alias("tv"),
        )
        .groupBy("month")
        .agg(
            F.sum("pv").alias("promo_micros"),
            F.sum("tv").alias("total_micros"),
        )
    )


# TPC-H Q16 shape: supplier variety per (brand, size) with an
# exclusion list — the exclusion is a tiny broadcast anti-join BEFORE
# the distinct count, so excluded suppliers never enter the shuffle.
@register(
    "q_supplier_variety",
    """
    SELECT p_brand, p_size,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2' AND p_size <= 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2") & (F.col("p_size") <= 25)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


# TPC-H Q19 shape: disjunctive brand/size/quantity predicates. The
# OR-of-ANDs sits in ONE join condition over a broadcast part dim —
# a single scan of the fact table, no union of three subqueries.
@register(
    "q_special_revenue",
    f"""
    SELECT CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_micros,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 11 AND 25
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 26 AND 50
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#11") & size.between(1, 10) & qty.between(1, 15))
        | ((brand == "Brand#22") & size.between(11, 25) & qty.between(10, 25))
        | ((brand == "Brand#15") & size.between(26, 50) & qty.between(20, 35))
    )
    vol = _micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(vol).alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# TPC-H Q20 shape (no partsupp): outsized suppliers — those who
# shipped more than TWICE a part's fair share (qty * n_suppliers >
# 2 * part total, exact integers; parts here spread over ~27
# suppliers, so absolute majority never occurs). Two fact-side
# pre-aggregates reusing the same (part, supplier) grouping;
# supplier dim joins LAST, against the already-tiny dominated set.
@register(
    "q_dominant_supplier",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_ps
      FROM lineitem GROUP BY 1, 2
    ),
    pt AS (
      SELECT partkey, CAST(SUM(qty_ps) AS BIGINT) AS qty_p,
             COUNT(*) AS n_supp
      FROM ps GROUP BY 1
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_dominated
    FROM ps JOIN pt USING (partkey)
    JOIN supplier ON s_suppkey = suppkey
    WHERE n_supp >= 2 AND qty_ps * n_supp > 2 * qty_p
    GROUP BY s_suppkey, s_name
    """,
)
def q_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_ps"))
    )
    pt = ps.groupBy("partkey").agg(
        F.sum("qty_ps").alias("qty_p"), F.count(F.lit(1)).alias("n_supp")
    )
    dominated = (
        ps.join(pt, "partkey")
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("qty_ps") * F.col("n_supp") > 2 * F.col("qty_p"))
        )
    )
    return (
        dominated.join(supp, dominated["suppkey"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
    )


# TPC-H Q21 shape: the sole offender — multi-supplier orders where
# exactly ONE supplier shipped late (> 60 days after the order).
# The whole EXISTS / NOT-EXISTS pair collapses into one per-order
# aggregate (distinct suppliers vs distinct late suppliers), so the
# fact table shuffles once on the order key; the supplier dim joins
# against the per-supplier counts at the end.
@register(
    "q_sole_delayed",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_sole_late
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_suppkey, s_name
    """,
)
def q_sole_delayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Two-level aggregate instead of two COUNT(DISTINCT)s in one agg:
    # distinct (order, supplier) pairs first, then plain counts — no
    # Expand operator doubling the shuffle input.
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("any_late"))
    )
    per_order = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("any_late").alias("n_late"),
            F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(supp, per_order["late_supp"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_sole_late"))
    )


# ---------------------------------------------------------------------------
# Corpus-statistics operators for training-data curation: mixture
# accounting, corpus-LM quality scoring, boilerplate span detection,
# and cross-source duplication — each one or two scan-side aggregates,
# no driver loops, no floats before micros quantization.
# ---------------------------------------------------------------------------


# Training-mixture accounting: per (source, lang) doc/char/token
# volumes + each cell's share of corpus tokens. The share window runs
# over the aggregated (source x lang) relation — tiny — never the
# corpus.
@register(
    "q_corpus_mixture",
    f"""
    WITH cell AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(len(list_filter({_TOKENS_SQL}, t -> t <> ''))) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, total_chars, total_tokens,
           CAST(total_tokens AS DOUBLE)
             / CAST(SUM(total_tokens) OVER () AS DOUBLE) AS token_share
    FROM cell
    """,
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.filter(_tokens_col(), lambda t: t != "")).cast("long")
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(ntok).alias("total_tokens"),
    )
    return cell.withColumn(
        "token_share",
        F.col("total_tokens").cast("double")
        / F.sum("total_tokens").over(Window.partitionBy()).cast("double"),
    )


# Corpus-unigram-LM quality score: mean token log-probability per doc
# under the corpus's own unigram distribution (fluency-independent
# outlier signal — docs of rare tokens score low). Two aggregates:
# global token counts (vocabulary-sized), then an equi-join back on
# token — the vocab side is orders of magnitude smaller than the
# corpus and AQE broadcasts it when it fits; per-token ln() is
# micros-quantized BEFORE the per-doc sum (same cross-engine-libm
# guard as q_entropy).
@register(
    "q_unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
    ), tokf AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), vocab AS (
      SELECT token, COUNT(*) AS n FROM tokf GROUP BY token
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CAST(FLOOR(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                               * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS logprob_micros,
           CAST(SUM(CAST(FLOOR(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                               * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*) AS mean_logprob
    FROM tokf JOIN vocab USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_tokens_col()).alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = vocab.agg(F.sum("n").cast("long").alias("total"))
    lp_micros = F.floor(
        F.log(F.col("n").cast("double") / F.col("total").cast("double")) * 1000000
        + 0.5
    ).cast("long")
    return (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lp_micros).alias("logprob_micros"),
            (
                F.sum(lp_micros).cast("double") / 1000000 / F.count(F.lit(1))
            ).alias("mean_logprob"),
        )
    )


# Boilerplate span detection (CCNet-style, on token 8-grams): spans
# recurring across >= min_docs distinct docs are boilerplate; report
# each doc's boilerplate fraction. Inverted index on the span hash —
# explode distinct spans per doc, two-phase count, join back. The
# corpus shuffles its span lists once; no doc-x-doc comparison.
@register(
    "q_boilerplate",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_TOKENS_SQL}, t -> t <> '') AS ts
      FROM documents
    ), spans AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, GREATEST(len(ts) - 7, 0) + 1),
               i -> array_to_string(list_slice(ts, i, i + 7), ' ')))) AS span
      FROM toks
    ), common AS (
      SELECT span FROM spans GROUP BY span
      HAVING COUNT(DISTINCT doc_id) >= 3
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN common.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           CAST(SUM(CASE WHEN common.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS boiler_frac
    FROM spans LEFT JOIN common USING (span)
    GROUP BY doc_id
    """,
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(_tokens_col(), lambda t: t != "")
    # sequence() is INCLUSIVE of its stop (and descends when stop <
    # start) where DuckDB's range() is exclusive — guard both the
    # off-by-one and the <8-token case explicitly
    idx = F.when(
        F.size(ts) >= 8, F.sequence(F.lit(1), F.size(ts) - 7)
    ).otherwise(F.array().cast("array<int>"))
    spans_arr = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i, 8)))
    )
    # Spans are DISTINCT per doc, so count(*) per span == docs
    # containing the span. A groupBy combines MAP-SIDE, so a hot span
    # (a crawl-wide footer sitting in 1e8 docs) costs O(distinct spans
    # per mapper), where a `count() over (partition by span)` window
    # would funnel every replica of the hot span onto one reducer.
    # The spans relation is persisted so the tokenize+8-gram subtree
    # still evaluates ONCE across both consumers (the unstaged join
    # formulation re-ran the regex scan per branch, ~2x slower at
    # sf0.1); the survivor set is small by construction (only spans
    # shared by >=3 docs) and joins back un-hinted so AQE broadcasts
    # it when it fits and degrades to a shuffle join when it doesn't.
    spans = docs.select("doc_id", F.explode(spans_arr).alias("span")).persist()
    common = (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 3)
        .select("span", F.lit(1).alias("_hit"))
    )
    return (
        spans.join(common, "span", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_boiler"),
            (
                F.coalesce(F.sum("_hit"), F.lit(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("boiler_frac"),
        )
    )


# Source duplication matrix: how many EXACT-duplicate pairs each
# (source, source) combination contributes — the dedup-policy view
# of which sources re-host content (diagonal = within-source dups).
# Same one-groupBy + in-bucket i<j expansion as the minhash path —
# the corpus never self-joins; pair sources ordered canonically.
@register(
    "q_cross_source_dups",
    f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + {_DUP_OFFSET} AS doc_id,
             source || '_mirror' AS source, text
      FROM documents WHERE doc_id % 3 = 0
    ),
    h AS (
      SELECT doc_id, source, md5(text) AS hh FROM corpus
    )
    SELECT LEAST(a.source, b.source) AS source_a,
           GREATEST(a.source, b.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM h a JOIN h b ON a.hh = b.hh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # deterministic mirror of a third of the corpus under a renamed
    # source, so the cross-source diagonal is non-trivial at any SF
    mirrored = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
        F.concat(F.col("source"), F.lit("_mirror")).alias("source"),
        "text",
    )
    corpus = docs.select("doc_id", "source", "text").unionAll(mirrored)
    h = corpus.select(
        F.struct("doc_id", "source").alias("v"), F.md5("text").alias("hh")
    )
    buckets = (
        h.groupBy("hh")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
        .filter(F.size("vs") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(vs, (x, i) ->"
        " transform(slice(vs, i + 2, size(vs)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(
            F.least(F.col("p.a.source"), F.col("p.b.source")).alias("source_a"),
            F.greatest(F.col("p.a.source"), F.col("p.b.source")).alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# merge_asof direction parity (operators/asof.py): forward and
# nearest variants of q_asof_join on the same click/purchase shape.
# Both stay the one-shuffle union-window formulation — nearest runs
# BOTH direction frames over the same union (no second shuffle, no
# join of two asof outputs). Oracles are correlated subqueries with
# the exact pandas tie rules (backward ties -> highest id, forward
# ties -> lowest id, nearest equal-distance -> backward).
# ---------------------------------------------------------------------------


@register(
    "q_asof_forward",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id,
           (SELECT r.value FROM r
            WHERE r.user_id = l.user_id AND r.ts >= l.ts
            ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) AS next_purchase_value
    FROM l
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"), "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), "user_id", "ts",
        F.col("value").alias("next_purchase_value"),
    )
    out = asof_join(
        left, right, key="user_id", ts="ts",
        value_cols=["next_purchase_value"], right_tiebreak="r_event_id",
        direction="forward",
    )
    return out.select(
        F.col("l_event_id").alias("event_id"), "user_id", "next_purchase_value"
    )


@register(
    "q_asof_nearest",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id,
           (SELECT r.value FROM r
            WHERE r.user_id = l.user_id
            ORDER BY ABS(epoch_us(r.ts) - epoch_us(l.ts)) ASC,
                     CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END ASC,
                     CASE WHEN r.ts <= l.ts THEN -r.event_id
                          ELSE r.event_id END ASC
            LIMIT 1) AS nearest_purchase_value
    FROM l
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"), "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), "user_id", "ts",
        F.col("value").alias("nearest_purchase_value"),
    )
    out = asof_join(
        left, right, key="user_id", ts="ts",
        value_cols=["nearest_purchase_value"], right_tiebreak="r_event_id",
        direction="nearest",
    )
    return out.select(
        F.col("l_event_id").alias("event_id"), "user_id", "nearest_purchase_value"
    )


# Mergeable HLL distinct sketches (operators/sketches.py): daily
# user sketches + re-grouped estimates, the store-parts/merge-at-read
# pattern. Sketch bytes are engine-specific -> rows-only; accuracy
# and mergeability are pinned by tests/test_sketches.py.
@register("q_sketch_users", None)
def q_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import merge_sketches, sketch_parts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    parts = sketch_parts(ev, ["day"], "user_id")
    return merge_sketches(parts, ["day"]).orderBy("day")


# ---------------------------------------------------------------------------
# The remaining TPC-H shapes (Q6/Q9/Q11 adapted — no partsupp):
# completing the Q1-Q22 sweep. Q6 is the canonical pushdown probe;
# Q9 a profit decomposition over the full star; Q11 a share-of-total
# gate against a broadcast scalar.
# ---------------------------------------------------------------------------


# TPC-H Q6 shape: one-scan conditional revenue — every predicate
# reaches the parquet scan (no join at all); the classic pushdown
# benchmark probe.
@register(
    "q_forecast_revenue",
    f"""
    SELECT CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice * l_discount')}) AS BIGINT)
             AS revenue_micros,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_micros(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# TPC-H Q9 shape: profit by supplier nation and year. Cost side
# adapted to p_retailprice (no partsupp supplycost); the part filter
# prunes the broadcast dim BEFORE the fact join, profit stays in
# exact integer micros end-to-end.
@register(
    "q_profit_by_nation",
    f"""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM({_MICROS_SQL.format(
               expr='(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1)'
           )}) AS BIGINT) AS profit_micros
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = _micros(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("pm"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("pm").alias("profit_micros"))
    )


# TPC-H Q11 shape: parts whose shipped value exceeds a multiple of
# the MEAN part share (scale-free — a fixed fraction-of-total gate
# goes vacuous as the part count grows with SF). The grand total +
# part count is a 1-row broadcast joined into the HAVING-style
# filter; the share gate compares exact integers
# (value * n_parts > 2 * total ⇔ share > 2x mean).
@register(
    "q_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice')}) AS BIGINT)
               AS value_micros
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(value_micros) AS BIGINT) AS total_micros,
             COUNT(*) AS n_parts
      FROM pv
    )
    SELECT partkey, value_micros
    FROM pv CROSS JOIN tot
    WHERE value_micros * n_parts > 2 * total_micros
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_micros(F.col("l_extendedprice"))).alias("value_micros")
    )
    tot = pv.agg(
        F.sum("value_micros").alias("total_micros"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_micros") * F.col("n_parts") > 2 * F.col("total_micros"))
        .select("partkey", "value_micros")
    )


# Semi-structured VARIANT path (Spark 4): parse_json once into a
# VariantType column, typed extraction via variant_get — the
# shredding-friendly engine path for JSON at scale (one binary parse
# per row instead of a schema-bound from_json per referenced field
# set; at rest, variant shredding lets the reader prune to the
# referenced subfields the way column pruning does for structs).
# Same oracle shape as q_json_extract — semantics identical, the
# difference is the execution path.
@register(
    "q_variant_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(props->>'k' AS BIGINT)) AS n_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Embedding-label quality eval: nearest-centroid classifier purity.
# How separable are the labels in embedding space? Assign every
# vector to its nearest label centroid (euclidean, exact fixed-point
# integers end-to-end) and report per-label purity. The centroid
# table is vocabulary-sized (labels x dims) and broadcasts; the
# corpus sees one explode + one broadcast join + one per-vector
# window — no pairwise vector comparison anywhere. Centroid
# components quantize via an IEEE double division of exact ints
# (bit-identical both engines) so the argmin is comparison-exact.
# ---------------------------------------------------------------------------


@register(
    "q_label_purity",
    """
    WITH ex AS (
      SELECT vec_id, label, i AS pos,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS xq
      FROM embeddings, range(1, 65) t(i)
    ),
    cent AS (
      SELECT label AS c_label, pos,
             CAST(FLOOR(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu
      FROM ex GROUP BY 1, 2
    ),
    d AS (
      SELECT vec_id, label, c_label, SUM((xq - mu) * (xq - mu)) AS d2
      FROM ex JOIN cent USING (pos)
      GROUP BY 1, 2, 3
    ),
    a AS (
      SELECT vec_id, label, c_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
      FROM d
    )
    SELECT label, COUNT(*) AS n,
           CAST(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS purity
    FROM a WHERE rk = 1 GROUP BY label
    """,
)
def q_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1048576 + 0.5).cast("long").alias("xq"),
    )
    cent = (
        ex.groupBy(F.col("label").alias("c_label"), "pos")
        .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).alias("cn"))
        .select(
            "c_label",
            "pos",
            F.floor(F.col("s").cast("double") / F.col("cn")).cast("long").alias("mu"),
        )
    )
    diff = F.col("xq") - F.col("mu")
    d = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    assigned = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    correct = F.when(F.col("c_label") == F.col("label"), 1).otherwise(0)
    return assigned.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(correct).cast("long").alias("n_correct"),
        (F.sum(correct).cast("double") / F.count(F.lit(1))).alias("purity"),
    )


# Temperature-reweighted source mixture (the LLM-training recipe:
# sample sources proportional to size^alpha to up-weight small
# high-quality sources). alpha = 0.5 deliberately: IEEE-754 sqrt is
# CORRECTLY ROUNDED on both engines (a libm pow(x, 0.7) is not), and
# each sqrt term is micros-quantized before the normalizing sum —
# a float SUM OVER () rounds differently per partition order. The
# share window runs over the tiny per-source aggregate.
@register(
    "q_mixture_weights",
    f"""
    WITH cell AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter({_TOKENS_SQL}, t -> t <> ''))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST(CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) OVER () AS DOUBLE)
             AS sample_weight,
           CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE)
             AS natural_share
    FROM cell
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.filter(_tokens_col(), lambda t: t != "")).cast("long")
    cell = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(ntok).alias("n_tokens")
    )
    # quantize each sqrt term to integer micros BEFORE the sum — a
    # float SUM OVER () is partition-order-dependent in its rounding
    wq = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000 + 0.5).cast("long")
    win = Window.partitionBy()
    return cell.select(
        "source",
        "n_docs",
        "n_tokens",
        (wq.cast("double") / F.sum(wq).over(win).cast("double")).alias("sample_weight"),
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(win).cast("double")
        ).alias("natural_share"),
    )


# Near-duplication rate per source: which sources contribute dup
# pressure (the curation signal that drives source-level filtering
# decisions). Reuses the MinHash candidate pairs verbatim — pair
# docs map back to their original's source (copies carry
# original_id + offset) with ONE broadcast join of the tiny
# (doc_id, source) projection against the distinct pair members.
@register(
    "q_dup_rate_by_source",
    f"""
    WITH pairs AS ({_MINHASH_PAIRS_SQL}),
    pair_docs AS (
      SELECT DISTINCT CASE WHEN d >= {_DUP_OFFSET} THEN d - {_DUP_OFFSET} ELSE d END
               AS doc_id
      FROM (SELECT doc_a AS d FROM pairs UNION ALL SELECT doc_b FROM pairs)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(SUM(CASE WHEN pd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_rate
    FROM documents LEFT JOIN pair_docs pd USING (doc_id)
    GROUP BY source
    """,
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = mh_ops.minhash_signatures(
        _with_near_copies(docs), "doc_id", "text", n=3, num_hashes=_MH_K
    )
    pairs = mh_ops.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)
    members = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionAll(pairs.select(F.col("doc_b")))
        .select(
            F.when(F.col("d") >= _DUP_OFFSET, F.col("d") - _DUP_OFFSET)
            .otherwise(F.col("d"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(members), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("n_dup_docs"),
            (
                F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )


# Exact quantiles WITHOUT per-group value buffering: Spark's exact
# percentile() aggregate collects every group value into one
# reducer's memory — fatal when a group holds billions of rows. The
# two-phase distributed rank (operators/ranking.py) turns an exact
# nearest-rank quantile into `rank == ceil(p * n)`: a filter over
# ranks, nothing buffered anywhere. Nearest-rank (not interpolated)
# semantics spelled out identically in the oracle via ROW_NUMBER so
# neither engine's quantile-definition quirks are in play.
@register(
    "q_quantiles_scalable",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
                         THEN CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS p50_micros,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * cnt) AS BIGINT)
                         THEN CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS p90_micros,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * cnt) AS BIGINT)
                         THEN CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS p99_micros
    FROM ranked GROUP BY o_orderpriority
    """,
)
def q_quantiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ranked = grouped_rank(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
    )
    price_micros = _micros(F.col("o_totalprice"))
    cnt = F.col("group_cnt")
    rn = F.col("rn")

    def at(p: float) -> F.Column:
        return F.max(
            F.when(rn == F.ceil(F.lit(p) * cnt).cast("long"), price_micros)
        ).cast("long")

    return ranked.groupBy("o_orderpriority").agg(
        at(0.5).alias("p50_micros"),
        at(0.9).alias("p90_micros"),
        at(0.99).alias("p99_micros"),
    )


# k-NN label accuracy: does a vector's neighborhood agree with its
# label? (The eval that catches broken embeddings before a model
# trains on them.) Exact 10-NN cosine for a fixed query subset
# (vec_id < 100 — keeps the O(|Q| x n x d) oracle tractable at every
# SF; the Spark side broadcasts the same subset), majority neighbor
# label with ties to the smaller label, accuracy per true label.
@register(
    "q_knn_label_acc",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 100
      GROUP BY 1, 2
    ),
    knn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY CAST(dot AS DOUBLE)
                          / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                          neighbor_id) AS rank
        FROM dots JOIN norms nq ON query_id = nq.vec_id
                  JOIN norms nc ON neighbor_id = nc.vec_id
      ) WHERE rank <= 10
    ),
    votes AS (
      SELECT query_id, e2.label AS n_label, COUNT(*) AS votes
      FROM knn JOIN embeddings e2 ON e2.vec_id = neighbor_id
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, n_label AS pred_label FROM (
        SELECT query_id, n_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, n_label) AS rk
        FROM votes
      ) WHERE rk = 1
    )
    SELECT e.label, COUNT(*) AS n,
           CAST(SUM(CASE WHEN pred_label = e.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN pred_label = e.label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS knn_acc
    FROM pred JOIN embeddings e ON e.vec_id = query_id
    GROUP BY e.label
    """,
)
def q_knn_label_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    knn = ann_ops.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 100), "vec_id", "embedding", k=10
    )
    labels = emb.select("vec_id", "label")
    # labels is the SF-scaled embeddings projection: both joins stay
    # un-hinted; AQE broadcasts the genuinely small side (knn /
    # pred ≈ |query set| rows) at runtime.
    votes = (
        knn.join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), "n_label")
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("n_label").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
    return (
        pred.join(
            labels.select(F.col("vec_id").alias("query_id"), "label"),
            "query_id",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(correct).cast("long").alias("n_correct"),
            (F.sum(correct).cast("double") / F.count(F.lit(1))).alias("knn_acc"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-salted paths, registered (operators/skew.py was test-only):
# the oracle is the PLAIN formulation — exactness of the salted
# rewrite is the whole point, so the driver now witnesses it.
# ---------------------------------------------------------------------------

from frames_spark.operators import skew as skew_ops  # noqa: E402


@register(
    "q_salted_agg",
    f"""
    SELECT l_returnflag,
           CAST(SUM({_MICROS_SQL.format(expr='l_quantity')}) AS BIGINT)
             AS sum_qty_micros,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", _micros(F.col("l_quantity")).alias("qty_micros")
    )
    out = skew_ops.salted_sum_count(li, ["l_returnflag"], ["qty_micros"])
    return out.select(
        "l_returnflag",
        F.col("sum_qty_micros").cast("long").alias("sum_qty_micros"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "q_salted_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_events
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = skew_ops.salted_join(ev, dim, "user_id", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# MinHash estimator accuracy: per candidate pair, the signature-
# agreement estimate (matching components / k — the unbiased Jaccard
# estimator LSH thresholds act on) against the exact shingle Jaccard.
# The eval a dedup pipeline runs before trusting its bands: both
# numbers are ratios of exact integers, so the row hash is exact.
# Exact-side work is restricted to the candidate pairs (inverted-
# index join semi-filtered by pair membership), never all pairs.
@register(
    "q_minhash_accuracy",
    _MH_CTES
    + f"""
    , pairs AS ({_MH_PAIRS_SELECT}),
    est AS (
      SELECT doc_a, doc_b,
             ({" + ".join(f"CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END" for i in range(_MH_K))})
               / {_MH_K}.0 AS est_jaccard
      FROM pairs JOIN sigs sa ON sa.doc = doc_a
                 JOIN sigs sb ON sb.doc = doc_b
    ),
    sizes AS (SELECT doc, COUNT(*) AS n FROM shingled GROUP BY doc),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN shingled s1 ON s1.doc = p.doc_a
      JOIN shingled s2 ON s2.doc = p.doc_b AND s2.shingle = s1.shingle
      GROUP BY 1, 2
    )
    SELECT e.doc_a, e.doc_b, est_jaccard,
           CAST(COALESCE(n_common, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(n_common, 0)) AS exact_jaccard,
           ABS(est_jaccard - CAST(COALESCE(n_common, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(n_common, 0))) AS abs_err
    FROM est e
    JOIN sizes sa ON sa.doc = e.doc_a
    JOIN sizes sb ON sb.doc = e.doc_b
    LEFT JOIN common c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
    """,
)
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_near_copies(load_table(spark, sf_dir, "documents"))
    sigs = mh_ops.minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=_MH_K)
    pairs = mh_ops.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)
    sa = sigs.select(
        F.col("doc").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(_MH_K)],
    )
    sb = sigs.select(
        F.col("doc").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(_MH_K)],
    )
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(_MH_K)
    )
    est = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (agree / float(_MH_K)).alias("est_jaccard"))
    )
    sh = jac_ops.shingle_index(docs, "doc_id", "text", 3)
    member = (
        pairs.select(F.col("doc_a").alias("doc"))
        .unionAll(pairs.select("doc_b"))
        .distinct()
    )
    sh = sh.join(F.broadcast(member), "doc", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    # posting-list i<j expansion over the member-restricted index
    # (jaccard.py's shape: one lineage, one shuffle) instead of the
    # raw two-sided shingle self-join — a shingle hot even among LSH
    # members would expand D² join rows before the pair semi-join
    # could prune; here it is one sorted array row
    postings = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        postings.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .join(pairs, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = nc.cast("double") / (F.col("na") + F.col("nb") - nc)
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a", "doc_b", "est_jaccard",
            exact.alias("exact_jaccard"),
            F.abs(F.col("est_jaccard") - exact).alias("abs_err"),
        )
    )


# DAU / WAU: daily active users + exact 7-day rolling distinct users.
# Exact rolling distinct cannot ride a window frame (COUNT(DISTINCT)
# isn't windowable); the scale shape is: reduce events to distinct
# (user, day) pairs FIRST (the big cardinality drop), then explode
# each pair into the <=7 week-windows it belongs to and count
# distinct per window end — shuffle volume is pairs x 7, never
# events x 7, and no per-day state accumulates anywhere.
@register(
    "q_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    expanded AS (
      SELECT d.day AS win_end, ud.user_id
      FROM ud JOIN days d
        ON ud.day <= d.day AND ud.day > d.day - INTERVAL 7 DAY
    )
    SELECT e.win_end AS day,
           (SELECT COUNT(DISTINCT user_id) FROM ud WHERE ud.day = e.win_end) AS dau,
           COUNT(DISTINCT e.user_id) AS wau
    FROM expanded e
    GROUP BY e.win_end
    """,
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    # each (user, day) pair contributes to the 7 window-ends
    # [day, day+6]; generate them as an explode of a literal range —
    # the join-to-days form in the oracle is the same cardinality but
    # the sequence explode avoids materializing a days dimension
    offsets = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    expanded = ud.select("user_id", "day", offsets).select(
        "user_id",
        (F.col("day") + F.make_dt_interval(F.col("off"))).alias("win_end"),
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    # windows whose end is beyond the observed range would be partial;
    # restrict to days that actually occur (matches the oracle's join)
    wau = (
        expanded.join(F.broadcast(dau.select(F.col("day").alias("win_end"))), "win_end")
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["win_end"])
        .select("day", "dau", "wau")
    )


# The sketch twin of q_active_users: WAU from stored daily HLL parts.
# The x7 window expansion here touches the PARTS table (one row per
# day) instead of the (user, day) pairs — at 100 TB that's the whole
# difference: exact WAU shuffles pairs x 7, sketch WAU unions ~7
# kilobyte sketches per window from an already-materialized rollup.
# Rows-only (sketch bytes are engine-specific); the estimate-vs-
# exact bound is pinned by tests/test_sketches.py.
@register("q_active_users_sketch")
def q_active_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import sketch_parts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    parts = sketch_parts(ev, ["day"], "user_id")
    expanded = parts.select(
        "sketch",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select(
        "sketch", (F.col("day") + F.make_dt_interval(F.col("off"))).alias("win_end")
    )
    observed = parts.select(F.col("day").alias("win_end"))
    return (
        expanded.join(F.broadcast(observed), "win_end")
        .groupBy("win_end")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            F.col("win_end").alias("day"),
            F.hll_sketch_estimate("merged").alias("wau_est"),
        )
        .orderBy("day")
    )


# Bigram-LM quality score: mean log P(w_t | w_{t-1}) per doc under
# the corpus's own bigram model — the next quality signal after
# q_unigram_logprob (catches plausible-words-in-implausible-order
# docs that unigram scoring cannot). Conditional probability =
# bigram count / predecessor unigram count, both exact integers from
# two vocabulary-sized aggregates; the corpus-side work is one
# positional self-alignment in the SCAN stage (tokens shifted via
# array ops — no posexplode self-join), then an equi-join against
# the bigram table. Per-pair ln() micros-quantized before the doc
# sum (the standing cross-engine libm guard).
@register(
    "q_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_TOKENS_SQL}, t -> t <> '') AS ts
      FROM documents
    ),
    big AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
      FROM toks
    ),
    bcnt AS (SELECT bigram, COUNT(*) AS nb FROM big GROUP BY bigram),
    ucnt AS (
      SELECT w1, CAST(SUM(nb) AS BIGINT) AS nu FROM (
        SELECT string_split(bigram, ' ')[1] AS w1, nb FROM bcnt
      ) GROUP BY w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR(ln(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE))
                               * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS logprob_micros,
           CAST(SUM(CAST(FLOOR(ln(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE))
                               * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*) AS mean_logprob
    FROM big
    JOIN bcnt USING (bigram)
    JOIN ucnt ON string_split(bigram, ' ')[1] = w1
    GROUP BY doc_id
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(_tokens_col(), lambda t: t != "")
    bigrams_arr = F.transform(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
        lambda _x, i: F.concat_ws(" ", F.element_at(ts, i + 1), F.element_at(ts, i + 2)),
    )
    big = docs.select("doc_id", F.explode(bigrams_arr).alias("bigram"))
    bcnt = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("nb"))
    ucnt = (
        bcnt.select(F.split(F.col("bigram"), " ").getItem(0).alias("w1"), "nb")
        .groupBy("w1")
        .agg(F.sum("nb").alias("nu"))
    )
    lp = F.floor(
        F.log(F.col("nb").cast("double") / F.col("nu").cast("double")) * 1000000
        + 0.5
    ).cast("long")
    return (
        big.join(bcnt, "bigram")
        .join(ucnt, F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(lp).alias("logprob_micros"),
            (F.sum(lp).cast("double") / 1000000 / F.count(F.lit(1))).alias(
                "mean_logprob"
            ),
        )
    )


# Kaplan-Meier time-to-convert: the survival curve over days from a
# user's first view to first purchase, right-censored at the end of
# observation. Every heavy step is a per-user aggregate; the curve
# itself lives on a tiny per-day relation, where the risk-set sizes
# are reverse cumulative sums and the curve is a cumulative sum of
# micros-quantized ln(1 - d/n) terms — emitted AS the exact integer
# log-survival (exp() is libm and engine-drifty; callers exponentiate
# at the edge if they want probabilities).
@register(
    "q_survival",
    """
    WITH stage AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t1
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS tmax FROM events),
    obs AS (
      SELECT user_id,
             CASE WHEN t1 IS NOT NULL AND t1 >= t0 THEN 1 ELSE 0 END AS converted,
             CASE WHEN t1 IS NOT NULL AND t1 >= t0
                  THEN date_diff('day', t0, t1)
                  ELSE date_diff('day', t0, tmax) END AS t_days
      FROM stage CROSS JOIN horizon
      WHERE t0 IS NOT NULL
    ),
    byday AS (
      SELECT t_days,
             CAST(SUM(converted) AS BIGINT) AS d,
             COUNT(*) AS ending
      FROM obs GROUP BY t_days
    ),
    risk AS (
      SELECT t_days, d,
             CAST(SUM(ending) OVER (ORDER BY t_days DESC) AS BIGINT) AS n_at_risk
      FROM byday
    )
    SELECT t_days, d, n_at_risk,
           CAST(SUM(CASE WHEN d > 0 AND d < n_at_risk
                         THEN CAST(FLOOR(ln(1.0 - CAST(d AS DOUBLE)
                                              / CAST(n_at_risk AS DOUBLE))
                                         * 1000000 + 0.5) AS BIGINT)
                         WHEN d >= n_at_risk THEN NULL
                         ELSE 0 END)
                OVER (ORDER BY t_days) AS BIGINT) AS log_surv_micros
    FROM risk
    """,
)
def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t1"),
    )
    horizon = ev.agg(F.max("ts").alias("tmax"))
    converted = (F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0"))).cast("int")
    tdays = F.when(
        F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0")),
        F.datediff(F.col("t1"), F.col("t0")),
    ).otherwise(F.datediff(F.col("tmax"), F.col("t0")))
    obs = (
        stage.crossJoin(F.broadcast(horizon))
        .filter(F.col("t0").isNotNull())
        .select(converted.alias("converted"), tdays.alias("t_days"))
    )
    byday = (
        obs.withColumn("t_days", F.col("t_days").cast("long"))
        .groupBy("t_days")
        .agg(F.sum("converted").alias("d"), F.count(F.lit(1)).alias("ending"))
    )
    wdesc = (
        Window.orderBy(F.desc("t_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = byday.select(
        "t_days",
        F.col("d").cast("long").alias("d"),
        F.sum("ending").over(wdesc).alias("n_at_risk"),
    )
    d, n = F.col("d"), F.col("n_at_risk")
    term = (
        F.when(
            (d > 0) & (d < n),
            F.floor(
                F.log(F.lit(1.0) - d.cast("double") / n.cast("double")) * 1000000
                + 0.5
            ).cast("long"),
        )
        .when(d >= n, F.lit(None))
        .otherwise(F.lit(0))
    )
    wasc = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return risk.select(
        "t_days", "d", "n_at_risk",
        F.sum(term).over(wasc).cast("long").alias("log_surv_micros"),
    )


# Event-type transition matrix: P(next | current) per user journey —
# one lag window keyed by user (the sessionize shuffle shape), then
# exact count ratios on the tiny type-x-type relation.
@register(
    "q_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS (
      SELECT cur, nxt, COUNT(*) AS n FROM seq
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE) AS p
    FROM cnt
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("cur")
    return cnt.select(
        "cur", "nxt", "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias("p"),
    )


# Revenue concentration (Gini) over customers — the inequality
# summary a mixture/pricing analysis starts from. Exact formulation:
# G = 2*sum(rank_i * x_i) / (n * sum(x)) - (n + 1)/n over ascending
# per-customer totals; the global rank comes from the two-phase
# distributed rank (operators/ranking.py), never a single-partition
# window, and both sums are exact integer micros.
@register(
    "q_gini_revenue",
    """
    WITH cust AS (
      -- whole currency units (exact integer division of the micros
      -- sum): rank * micros overflows int64 by sf0.1; units keep the
      -- weighted sum exact and in-range through sf1+
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               // 1000000 AS spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT spend,
             ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS rn,
             COUNT(*) OVER () AS n
      FROM cust
    )
    SELECT CAST(SUM(rn * spend) AS BIGINT) AS weighted_units,
           CAST(SUM(spend) AS BIGINT) AS total_units,
           MAX(n) AS n_customers,
           2.0 * CAST(SUM(rn * spend) AS DOUBLE)
             / (MAX(n) * CAST(SUM(spend) AS DOUBLE))
             - CAST(MAX(n) + 1 AS DOUBLE) / MAX(n) AS gini
    FROM ranked
    """,
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # integral `div`, not float `/`: a double quotient can round
    # across an integer boundary where the oracle's BIGINT floor
    # division cannot
    cust = (
        o.groupBy("o_custkey")
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("_sm"))
        .select("o_custkey", F.expr("_sm div 1000000").alias("spend"))
    )
    # stage=True: cust is an aggregate output, so its within-partition
    # row order is shuffle-fetch-dependent — pin the range exchange
    # (same hazard q_rfm hit live at sf0.1; see grouped_rank docstring)
    ranked = grouped_rank(cust, [], ["spend", "o_custkey"], rank_col="rn",
                          count_col="n", stage=True)
    ws = F.sum(F.col("rn") * F.col("spend"))
    tot = F.sum("spend")
    n = F.max("n")
    return ranked.agg(
        ws.cast("long").alias("weighted_units"),
        tot.cast("long").alias("total_units"),
        n.alias("n_customers"),
        (
            2.0 * ws.cast("double") / (n * tot.cast("double"))
            - (n + 1).cast("double") / n
        ).alias("gini"),
    )


# Lag-1 autocorrelation of daily revenue — the is-there-momentum
# summary of a time series. Fact work is one day-grain aggregate;
# the (x_t, x_{t-1}) pairing is a lag window over the tiny daily
# relation, and the Pearson formula runs on exact integer moments
# over floored-thousands revenue (the q_corr technique), so no
# engine's corr() builtin — or its partition-order float drift — is
# involved, and the squared sums keep int64 headroom to ~sf100.
@register(
    "q_autocorr",
    f"""
    WITH daily AS (
      -- THOUSANDS of currency units: at ~sf1 daily revenue is ~1e8
      -- whole units, so SUM(x*x) over ~2400 days would crowd 2^63
      -- (Spark's long sum wraps silently where DuckDB promotes to
      -- HUGEINT). Floored thousands keep the moments exact AND give
      -- ~5 orders of magnitude of headroom; both engines floor the
      -- same way so the statistic stays bit-identical.
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               // 1000000000 AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT rev AS x, LAG(rev) OVER (ORDER BY day) AS y FROM daily
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs WHERE y IS NOT NULL
    )
    SELECT n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / NULLIF(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0)
             AS autocorr_lag1
    FROM m
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("_rm"))
        .select("day", F.expr("_rm div 1000000000").alias("rev"))
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        F.col("rev").alias("x"), F.lag("rev").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    denom = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return m.select(
        "n",
        ((d("n") * d("sxy") - d("sx") * d("sy")) / F.nullif(denom, F.lit(0.0))).alias(
            "autocorr_lag1"
        ),
    )


# Day-of-week seasonality profile: order volume and exact revenue
# share per weekday — one conditional-free scan aggregate over 7
# groups, share window over the 7-row relation. Engine quirk pinned
# here: Spark dayofweek() is 1-7 Sunday=1, DuckDB's is 0-6 Sunday=0.
@register(
    "q_weekday_profile",
    f"""
    WITH wk AS (
      SELECT dayofweek(o_orderdate) + 1 AS dow,
             COUNT(*) AS n_orders,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders GROUP BY 1
    )
    SELECT dow, n_orders, rev_micros,
           CAST(rev_micros AS DOUBLE)
             / CAST(SUM(rev_micros) OVER () AS DOUBLE) AS rev_share
    FROM wk
    """,
)
def q_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(F.dayofweek("o_orderdate").cast("long").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"),
    )
    return wk.withColumn(
        "rev_share",
        F.col("rev_micros").cast("double")
        / F.sum("rev_micros").over(Window.partitionBy()).cast("double"),
    )


# ---------------------------------------------------------------------------
# Round-4 surface: customer-value analytics, time-series QA, corpus
# source comparison, and dimensionality-reduction plumbing.
# ---------------------------------------------------------------------------


# RFM segmentation — the CRM workhorse: per ordering customer,
# Recency (days since last order, vs the corpus max date), Frequency
# (order count), Monetary (exact micros spend), each quartile-scored.
# All three NTILE(4)s ride the two-phase distributed rank
# (operators/ranking.py) over strict total orders — never a global
# single-task window over the customer table.
@register(
    "q_rfm",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(o_orderdate),
                            (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
               AS recency_days,
             COUNT(*) AS n_orders,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS spend_micros
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, n_orders, spend_micros,
           CAST(NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_score,
           CAST(NTILE(4) OVER (ORDER BY n_orders, o_custkey) AS BIGINT) AS f_score,
           CAST(NTILE(4) OVER (ORDER BY spend_micros, o_custkey) AS BIGINT) AS m_score
    FROM per_cust
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("_max_date"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_micros(F.col("o_totalprice"))).alias("spend_micros"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("_max_date"), F.col("_last"))
            .cast("long")
            .alias("recency_days"),
            "n_orders",
            "spend_micros",
        )
    )
    out = per_cust
    for metric, score in (
        ("recency_days", "r_score"),
        ("n_orders", "f_score"),
        ("spend_micros", "m_score"),
    ):
        # stage=True: the upstream here is a shuffle (groupBy, then
        # prior rank joins) whose within-partition row ORDER is not
        # deterministic, so the two-branch rank must pin its range
        # exchange with a localCheckpoint (see grouped_rank docstring)
        ranked = grouped_rank(
            out, [], [metric, "o_custkey"],
            rank_col="_rn", count_col="_cnt", stage=True,
        )
        out = ranked.withColumn(
            score, ntile_from_rank(F.col("_rn"), F.col("_cnt"), 4)
        ).drop("_rn", "_cnt")
    return out


# 7-day trailing moving average of daily revenue. The fact table
# collapses to one row per day FIRST (map-side combined); the moving
# window then runs over the tiny daily relation only — sum and count
# kept as exact integers, divided once as double.
@register(
    "q_moving_avg",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders GROUP BY 1
    )
    SELECT day, rev_micros,
           CAST(CAST(SUM(rev_micros) OVER w AS BIGINT) AS DOUBLE)
             / COUNT(*) OVER w AS ma7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day")).agg(
        F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "rev_micros",
        (
            F.sum("rev_micros").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7"),
    )


# Trailing-window anomaly days: revenue deviating > 2 sigma from the
# PRECEDING 28 days (current day excluded — no self-contamination).
# The sigma test is pure INTEGER arithmetic on floored-thousands
# revenue: |x - s/n| > 2*sqrt((n*ss - s^2))/n  <=>
# (n*x - s)^2 > 4*(n*ss - s^2), so no float crosses the engine
# boundary and the squared sums keep int64 headroom to ~sf100.
@register(
    "q_anomaly_days",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               // 1000000000 AS rev_k
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT day, rev_k,
             COUNT(*) OVER w AS n,
             CAST(SUM(rev_k) OVER w AS BIGINT) AS s,
             CAST(SUM(rev_k * rev_k) OVER w AS BIGINT) AS ss
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, rev_k FROM stats
    WHERE n >= 14
      AND (n * rev_k - s) * (n * rev_k - s) > 4 * (n * ss - s * s)
    """,
)
def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("_rm"))
        .select("day", F.expr("_rm div 1000000000").alias("rev_k"))
    )
    w = Window.orderBy("day").rowsBetween(-28, -1)
    stats = daily.select(
        "day",
        "rev_k",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("rev_k").over(w).alias("s"),
        F.sum(F.col("rev_k") * F.col("rev_k")).over(w).alias("ss"),
    )
    dev = F.col("n") * F.col("rev_k") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        stats.filter((F.col("n") >= 14) & (dev * dev > 4 * var_n2))
        .select("day", "rev_k")
    )


# Inter-order gap distribution: per-customer consecutive order gaps
# (lag window keyed by customer — parallelism = |customers|), then
# one global aggregate with bit-stable micros percentiles.
@register(
    "q_order_gap_stats",
    """
    WITH gaps AS (
      SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))
             - epoch_us(LAG(CAST(o_orderdate AS TIMESTAMP)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)) AS gap_us
      FROM orders
    )
    SELECT COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(FLOOR(quantile_cont(gap_us, 0.5)) AS BIGINT) AS p50_us,
           CAST(FLOOR(quantile_cont(gap_us, 0.9)) AS BIGINT) AS p90_us
    FROM gaps WHERE gap_us IS NOT NULL
    """,
)
def q_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # o_orderdate may arrive NTZ from the parquet footer; the cast is
    # exact under the pinned UTC session zone
    ts_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    gaps = o.select(
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        F.floor(F.percentile(F.col("gap_us"), F.lit(0.5))).cast("long").alias("p50_us"),
        F.floor(F.percentile(F.col("gap_us"), F.lit(0.9))).cast("long").alias("p90_us"),
    )


# Pairwise token-set Jaccard between corpus sources — "how much do
# my crawls overlap, vocabulary-wise". Candidate pairs come from ONE
# groupBy on the token (inverted index) with in-array i<j expansion
# — the (source, token-set) relations never self-join, and the
# per-source sizes are a broadcast.
@register(
    "q_source_jaccard",
    f"""
    WITH tok AS (
      SELECT DISTINCT source, unnest(list_filter({_TOKENS_SQL}, t -> t <> '')) AS token
      FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_common,
           sa.n AS n_a, sb.n AS n_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON source_a = sa.source
    JOIN sizes sb ON source_b = sb.source
    """,
)
def q_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source",
            F.explode(F.filter(_tokens_col(), lambda t: t != "")).alias("token"),
        )
        .distinct()
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    buckets = tok.groupBy("token").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    ).filter(F.size("ss") >= 2)
    pairs = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> struct(x AS a, y AS b))))"
    )
    inter = (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_common", "n_a", "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


# Random-projection sketch of the embedding corpus: project every
# vector onto 8 deterministic ±1 hyperplanes (the md5-derived planes
# the LSH path uses — here kept CONTINUOUS, not sign-quantized) and
# report per-dimension distribution stats. The dot products run in
# fixed-point integers, so the DuckDB twin reproduces them exactly
# from a planes VALUES literal. One pass, no shuffle beyond the
# 8-row aggregate.
@register(
    "q_random_projection",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(8)}),
    proj AS (
      SELECT vec_id, p, CAST(SUM(e * c) AS BIGINT) AS v
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    )
    SELECT CAST(p AS BIGINT) AS dim, COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_proj,
           CAST(MIN(v) AS BIGINT) AS min_proj,
           CAST(MAX(v) AS BIGINT) AS max_proj,
           CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_proj
    FROM proj GROUP BY p
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.vectors import dot_fixed, to_fixed
    from frames_spark.operators.core import spread

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    fvec = to_fixed(F.col("embedding"))
    planes = F.array(
        *[
            F.array(*[F.lit(v).cast("long") for v in embed_ops.plane_components(p, 64)])
            for p in range(8)
        ]
    )
    projs = F.transform(planes, lambda comp: dot_fixed(fvec, comp))
    return (
        emb.select(F.posexplode(projs).alias("dim", "v"))
        .groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_proj"),
            F.min("v").alias("min_proj"),
            F.max("v").alias("max_proj"),
            (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_proj"),
        )
    )


# Duplicate-cluster size histogram: how big are the exact-dup groups
# (cluster_size = docs sharing one md5(text))? The dedup-policy
# overview number — two map-side-combined groupBys, no joins.
@register(
    "q_cluster_sizes",
    """
    WITH sizes AS (
      SELECT md5(text) AS h, COUNT(*) AS cluster_size
      FROM documents GROUP BY 1
    )
    SELECT cluster_size, COUNT(*) AS n_clusters
    FROM sizes GROUP BY cluster_size
    """,
)
def q_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


# Calendar-RANGE moving average — the rows-frame/range-frame
# distinction that bites every time-series user: q_moving_avg's ROWS
# frame spans 7 *rows*, this RANGE frame spans 7 *calendar days*, so
# gaps in the date spine change the answer. Ordered on epoch seconds
# (both engines), exact integer sum/count divided once.
@register(
    "q_moving_avg_range",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             epoch(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)) AS day_s,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders GROUP BY 1, 2
    )
    SELECT day, rev_micros,
           CAST(n_win AS BIGINT) AS n_days,
           CAST(CAST(s_win AS BIGINT) AS DOUBLE) / n_win AS ma7d
    FROM (
      SELECT day, rev_micros,
             COUNT(*) OVER w AS n_win,
             SUM(rev_micros) OVER w AS s_win
      FROM daily
      WINDOW w AS (ORDER BY day_s
                   RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
    )
    """,
)
def q_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    daily = o.groupBy(
        day.alias("day"),
        F.unix_timestamp(day.cast("timestamp")).alias("day_s"),
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    w = Window.orderBy("day_s").rangeBetween(-6 * 86400, 0)
    return daily.select(
        "day",
        "rev_micros",
        F.count(F.lit(1)).over(w).alias("n_days"),
        (
            F.sum("rev_micros").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7d"),
    )


# Pareto frontier of customers on (frequency, monetary): keep
# customers no other customer strictly dominates. The scale shape —
# since the oracle's NOT EXISTS is a quadratic nested loop — is a
# TWO-LEVEL reduction: max spend per distinct order-count (a tiny
# relation), a running max over the strictly-higher counts, and one
# broadcast join back; the customer table never self-joins.
@register(
    "q_pareto_customers",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS spend_micros
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders, spend_micros FROM per_cust p
    WHERE NOT EXISTS (
      SELECT 1 FROM per_cust q
      WHERE q.n_orders >= p.n_orders AND q.spend_micros >= p.spend_micros
        AND (q.n_orders > p.n_orders OR q.spend_micros > p.spend_micros)
    )
    """,
)
def q_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_micros(F.col("o_totalprice"))).alias("spend_micros"),
    )
    # tiny relation: one row per DISTINCT n_orders value
    by_n = per_cust.groupBy("n_orders").agg(
        F.max("spend_micros").alias("max_spend")
    )
    # running max of max_spend over STRICTLY greater n (window over
    # the tiny by_n relation only)
    w = Window.orderBy(F.desc("n_orders")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    dom = by_n.select(
        "n_orders",
        "max_spend",
        F.coalesce(F.max("max_spend").over(w), F.lit(-1)).alias("hi_spend"),
    )
    # a customer is on the frontier iff: no higher-n customer reaches
    # their spend (spend > hi_spend) AND no same-n customer strictly
    # exceeds them (spend == max_spend of their n)
    return (
        per_cust.join(F.broadcast(dom), "n_orders")
        .filter(
            (F.col("spend_micros") > F.col("hi_spend"))
            & (F.col("spend_micros") == F.col("max_spend"))
        )
        .select("o_custkey", "n_orders", "spend_micros")
    )


# Top-k per group WITH TIES — RANK() semantics vs q_topk_per_group's
# ROW_NUMBER(): every order tying the k-th price stays in. Same
# one-window shape; group cardinality is the segment count, fine for
# a top-k report (the two-phase rank exists for fact-wide ranking).
@register(
    "q_topk_with_ties",
    f"""
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY {_MICROS_SQL.format(expr='o_totalprice')} DESC
                          ) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rnk <= 3
    """,
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    # rank on exact integer micros, never rounded doubles — the tie
    # CLASSES must agree bit-for-bit across engines for RANK parity
    w = Window.partitionBy("c_mktsegment").orderBy(
        _micros(F.col("o_totalprice")).desc()
    )
    return (
        joined.select(
            "c_mktsegment", "o_orderkey", "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# Hierarchical share-of-parent: each nation's revenue share WITHIN
# its region (and each region's share of the total). Two map-side
# aggregates; every share divides exact micros sums; all dimension
# joins broadcast; share windows only over the tiny nation/region
# relations.
@register(
    "q_share_of_parent",
    f"""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, rev_micros,
           CAST(rev_micros AS DOUBLE)
             / CAST(SUM(rev_micros) OVER (PARTITION BY region) AS DOUBLE)
             AS share_of_region,
           CAST(CAST(SUM(rev_micros) OVER (PARTITION BY region) AS BIGINT) AS DOUBLE)
             / CAST(SUM(rev_micros) OVER () AS DOUBLE) AS region_share
    FROM nat
    """,
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    )
    wr = Window.partitionBy("region")
    wall = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        "rev_micros",
        (
            F.col("rev_micros").cast("double")
            / F.sum("rev_micros").over(wr).cast("double")
        ).alias("share_of_region"),
        (
            F.sum("rev_micros").over(wr).cast("double")
            / F.sum("rev_micros").over(wall).cast("double")
        ).alias("region_share"),
    )


# New-vs-returning daily active users. The scale move is the same one
# q_active_users makes: collapse events to DISTINCT (user, day) FIRST
# (the big cardinality drop), derive first-seen per user from that
# relation, and key BOTH following shuffles on user_id so the exchange
# is reused; the day-grain aggregate at the end is tiny.
@register(
    "q_new_vs_returning",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      FROM events
    ), fs AS (
      SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
    )
    SELECT day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM ud JOIN fs USING (user_id)
    GROUP BY day
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    ud = ev.select(day.alias("day"), "user_id").distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).alias("returning_users"),
        )
    )


# Gopher-style (Rae et al. 2021) rule-based quality gate: word count
# bounds, mean-word-length band, alphabetic-word fraction — all pure
# JVM expressions in ONE scan, no Python in the path. Ratios are
# micros-quantized exact ints (cross-engine float guard); the pass
# flag ANDs the rules so downstream filters are a scan predicate.
@register(
    "q_gopher_quality",
    f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n_words,
             length(replace({_NORM_SQL}, ' ', '')) AS word_chars,
             len(list_filter({_TOKENS_SQL}, t -> regexp_matches(t, '[a-z]')))
               AS alpha_words
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           {_MICROS_SQL.format(expr='word_chars * 1.0 / n_words')}
             AS mean_word_len_micros,
           {_MICROS_SQL.format(expr='alpha_words * 1.0 / n_words')}
             AS alpha_frac_micros,
           (n_words BETWEEN 25 AND 100000
            AND {_MICROS_SQL.format(expr='word_chars * 1.0 / n_words')}
                BETWEEN 3000000 AND 10000000
            AND {_MICROS_SQL.format(expr='alpha_words * 1.0 / n_words')}
                >= 800000) AS passes
    FROM m
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    norm = text_fns.normalize(text)
    toks = text_fns.tokens(text)
    n_words = F.size(toks).cast("long")
    word_chars = F.length(F.replace(norm, F.lit(" "), F.lit("")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        _micros(word_chars.cast("double") / n_words).alias(
            "mean_word_len_micros"
        ),
        _micros(alpha_words.cast("double") / n_words).alias(
            "alpha_frac_micros"
        ),
    )
    return m.withColumn(
        "passes",
        F.col("n_words").between(25, 100000)
        & F.col("mean_word_len_micros").between(3000000, 10000000)
        & (F.col("alpha_frac_micros") >= 800000),
    )


# Exact covariance matrix of the embedding dimensions, computed as a
# DECLARATIVE plan: quantize each component to 2^20 fixed point (one
# transform), emit the upper-triangle outer products IN THE SCAN STAGE
# via nested array transforms (no self-join, no second shuffle of the
# corpus), and let map-side partial aggregation collapse the d^2/2
# expansion to O(d^2) rows per task before the only exchange. First
# moments come from a posexplode pass over the same quantized column.
# The (n*S_ij - S_i*S_j) combination runs in DECIMAL(38,0) (Spark) /
# HUGEINT (DuckDB) — identical integers, so the final int->double
# conversion is bit-equal in both engines.
@register(
    "q_embed_covariance",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))
               AS qv
      FROM embeddings
    ), ex AS (
      SELECT vec_id, generate_subscripts(qv, 1) - 1 AS i, unnest(qv) AS qi
      FROM q
    ), g AS (
      SELECT a.i AS i, b.i AS j,
             SUM(CAST(a.qi AS HUGEINT) * b.qi) AS s_ij
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), m AS (
      SELECT i, SUM(CAST(qi AS HUGEINT)) AS s, COUNT(*) AS n FROM ex GROUP BY i
    )
    SELECT CAST(g.i AS BIGINT) AS i, CAST(g.j AS BIGINT) AS j,
           CAST(mi.n * s_ij - mi.s * mj.s AS DOUBLE)
             / mi.n / mi.n / 1048576 / 1048576 AS cov
    FROM g JOIN m mi ON g.i = mi.i JOIN m mj ON g.j = mj.i
    """,
)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.vectors import to_fixed

    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(to_fixed(F.col("embedding")).alias("qv"))
    # upper-triangle outer products, built entirely inside the scan
    # stage: flatten(transform x transform over slice) — the corpus is
    # read once and never self-joined
    terms = q.select(
        F.explode(
            F.expr(
                "flatten(transform(qv, (xi, i) -> "
                "transform(slice(qv, i + 1, size(qv) - i), (xj, jo) -> "
                "struct(CAST(i AS BIGINT) AS i, CAST(i + jo AS BIGINT) AS j, "
                "xi * xj AS prod))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.prod")
    gram = terms.groupBy("i", "j").agg(F.sum("prod").alias("s_ij"))
    moments = (
        q.select(F.posexplode("qv").alias("i", "qi"))
        .groupBy(F.col("i").cast("long").alias("i"))
        .agg(F.sum("qi").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    mi = moments.select(
        F.col("i"), F.col("s").alias("s_i"), F.col("n").alias("n")
    )
    mj = moments.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    dec = "decimal(38,0)"
    fp2 = float(1 << 20) * float(1 << 20)
    return (
        gram.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("n").cast(dec) * F.col("s_ij").cast(dec)
                    - F.col("s_i").cast(dec) * F.col("s_j").cast(dec)
                ).cast("double")
                / F.col("n")
                / F.col("n")
                / F.lit(fp2)
            ).alias("cov"),
        )
    )


# Mergeable HISTOGRAM quantile parts — the numeric twin of
# q_sketch_users' HLL story: store per-day fixed-width bin counts
# (O(days x bins) rows, written once per ingest window), answer any
# date-range quantile by MERGING parts (a groupBy over the tiny parts
# relation) — the event table is scanned once to build parts and never
# again at query time. Estimates are bin lower bounds, deterministic
# integers, so unlike percentile_approx this sketch has a FULL SQL
# oracle. Bin width 100 currency units = 1e8 micros.
@register(
    "q_hist_quantiles",
    f"""
    WITH parts AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             {_MICROS_SQL.format(expr='o_totalprice')} // 100000000 AS bin,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), merged AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM parts GROUP BY bin
    ), cum AS (
      SELECT bin, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM merged
    )
    SELECT p, n, CAST(MIN(bin) * 100000000 AS BIGINT) AS est_lo_micros
    FROM cum CROSS JOIN (
      SELECT CAST(p AS DOUBLE) AS p
      FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) v(p)
    ) v
    WHERE cum >= ceil(p * n)
    GROUP BY p, n
    """,
)
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    parts = o.groupBy(
        day.alias("day"),
        F.expr(
            f"{_MICROS_SQL.format(expr='o_totalprice')} DIV 100000000"
        ).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    merged = parts.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    # windows over the MERGED bin relation only (~thousands of rows),
    # never the fact table
    cum = merged.select(
        "bin",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    ps = F.explode(
        F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.9, 0.99)])
    ).alias("p")
    return (
        cum.crossJoin(F.broadcast(cum.sparkSession.range(1).select(ps)))
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p", "n")
        .agg((F.min("bin") * F.lit(100000000)).cast("long").alias("est_lo_micros"))
    )


# Exact phi-heavy-hitter tokens via Misra-Gries pruning + recount
# (operators/sketches.py heavy_hitters). The sketch pass bounds
# memory at O(m) per partition and the shuffle at O(candidates);
# the exact recount + threshold makes the OUTPUT deterministic —
# partition layout can change which extra candidates MG emits, never
# which tokens survive — so a plain exact-count SQL oracle applies.
@register(
    "q_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest({_TOKENS_SQL}) AS tok FROM documents
    ), tot AS (SELECT COUNT(*) AS n_total FROM toks)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(n_total) AS BIGINT) AS n_total
    FROM toks CROSS JOIN tot
    GROUP BY tok
    HAVING COUNT(*) >= ceil(0.02 * MIN(n_total))
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import heavy_hitters

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(text_fns.tokens(F.col("text"))).alias("tok")
    )
    return heavy_hitters(toks, "tok", phi=0.02, m=256)


# BM25 relevance of every document against a fixed query-term set —
# the retrieval scorer a corpus pipeline uses for targeted slicing.
# Scale shape: tokens are FILTERED to the query terms inside the scan
# (array filter before explode), so the per-doc tf relation is
# O(docs x |query|), never the token stream; document-frequency and
# corpus stats are 1-row/3-row broadcasts. Per-term scores are
# micros-quantized before the doc-level sum (ln() libm guard, same
# as q_unigram_logprob).
_BM25_TERMS = ("spark", "query", "join")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "q_bm25",
    f"""
    WITH docs AS (
      SELECT doc_id, len({_TOKENS_SQL}) AS dl,
             list_filter({_TOKENS_SQL}, t -> t IN ({_BM25_TERMS_SQL})) AS qt
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM docs
    ), tf AS (
      SELECT doc_id, dl, unnest(qt) AS term FROM docs
    ), tfc AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2, 3
    ), dft AS (
      SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
    )
    SELECT doc_id, CAST(SUM({_MICROS_SQL.format(expr='''
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * 2.2
             / (tf + 1.2 * (0.25 + 0.75 * dl * n_docs / total_len))''')})
           AS BIGINT) AS score_micros
    FROM tfc JOIN dft USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = text_fns.tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        F.filter(
            toks, lambda t: t.isin(*_BM25_TERMS)
        ).alias("qt"),
    )
    stats = base.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tfc = (
        base.select("doc_id", "dl", F.explode("qt").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = 1.2, 0.75
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + k1 * (
        (1 - b)
        + b * F.col("dl") * F.col("n_docs") / F.col("total_len")
    )
    term_score = idf * F.col("tf") * (k1 + 1) / norm
    return (
        tfc.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(_micros(term_score)).alias("score_micros"))
    )


# Join-key skew diagnostics — the pre-flight check a 100 TB join
# needs before it shuffles: per-key row counts reduced to a tiny
# distribution summary (max/avg/top-share). Two-level aggregation —
# the per-key counts combine map-side, and every statistic over them
# is a second O(distinct keys) agg; nothing ever sorts the fact table.
@register(
    "q_key_skew",
    """
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           CAST(FLOOR(SUM(cnt) * 1.0 / COUNT(*) * 1000000 + 0.5) AS BIGINT)
             AS avg_key_rows_micros,
           CAST(FLOOR(MAX(cnt) * COUNT(*) * 1.0 / SUM(cnt) * 1000000 + 0.5)
             AS BIGINT) AS skew_factor_micros
    FROM per_key
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        _micros(F.sum("cnt") * 1.0 / F.count(F.lit(1))).alias(
            "avg_key_rows_micros"
        ),
        _micros(
            F.max("cnt") * F.count(F.lit(1)) * 1.0 / F.sum("cnt")
        ).alias("skew_factor_micros"),
    )


# Per-group exact nearest-rank median WITHOUT percentile()'s
# whole-group value buffering: the two-phase distributed rank
# (operators/ranking.py) turns the median into `rank == ceil(n/2)` —
# a filter — so parallelism is partitions x groups and no reducer
# ever holds a group's values. The grouped twin of
# q_quantiles_scalable.
@register(
    "q_group_median_scalable",
    f"""
    WITH r AS (
      SELECT c_mktsegment, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY {_MICROS_SQL.format(expr='o_totalprice')}, o_orderkey)
               AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment, o_totalprice AS median_price,
           CAST(n AS BIGINT) AS n
    FROM r WHERE rn = ceil(n / 2.0)
    """,
)
def q_group_median_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(
        c, F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", "o_totalprice", "o_orderkey")
    ranked = grouped_rank(
        joined,
        ["c_mktsegment"],
        [_micros(F.col("o_totalprice")), F.col("o_orderkey")],
        rank_col="rn",
        count_col="n",
    )
    return ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0)
    ).select(
        "c_mktsegment",
        F.col("o_totalprice").alias("median_price"),
        F.col("n").cast("long").alias("n"),
    )


# Weekly churn: users active in week w but absent in w+1. Collapse
# to DISTINCT (user, week) first, then ONE lead window keyed by
# user — no week-to-week self-join of the activity table. The last
# observed week is excluded (its churn is not yet knowable); that
# horizon comes from a 1-row max broadcast, not a driver collect.
@register(
    "q_churn",
    """
    WITH um AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS m
      FROM events
    ), nxt AS (
      SELECT user_id, m,
             LEAD(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
      FROM um
    ), horizon AS (SELECT MAX(m) AS max_m FROM um)
    SELECT m,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN next_m IS NULL
                          OR next_m > m + INTERVAL 7 DAYS
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
    FROM nxt CROSS JOIN horizon
    WHERE m < max_m
    GROUP BY m
    """,
)
def q_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    um = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("m")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("m")
    nxt = um.withColumn("next_m", F.lead("m").over(w))
    horizon = um.groupBy().agg(F.max("m").alias("max_m"))
    churned = F.when(
        F.col("next_m").isNull()
        | (F.col("next_m") > F.col("m") + F.expr("INTERVAL 7 DAYS")),
        1,
    ).otherwise(0)
    return (
        nxt.crossJoin(F.broadcast(horizon))
        .filter(F.col("m") < F.col("max_m"))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(churned).alias("n_churned"),
        )
    )


# Weekly stickiness (mean DAU / WAU): the standard engagement ratio.
# All cardinality drops happen FIRST (distinct user-day pairs), the
# rest is day- and week-grain arithmetic over tiny relations; the
# ratio divides exact integers once, micros-quantized.
@register(
    "q_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS m
      FROM events
    ), daily AS (
      SELECT m, day, COUNT(*) AS dau FROM ud GROUP BY m, day
    ), monthly AS (
      SELECT m, COUNT(DISTINCT user_id) AS wau FROM ud GROUP BY m
    ), per_month AS (
      SELECT m, CAST(SUM(dau) AS BIGINT) AS sum_dau,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY m
    )
    SELECT m, sum_dau, n_days, CAST(wau AS BIGINT) AS wau,
           CAST(FLOOR(sum_dau * 1.0 / n_days / wau * 1000000 + 0.5) AS BIGINT)
             AS stickiness_micros
    FROM per_month JOIN monthly USING (m)
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("m"),
    ).distinct()
    daily = ud.groupBy("m", "day").agg(F.count(F.lit(1)).alias("dau"))
    monthly = ud.groupBy("m").agg(
        F.count_distinct("user_id").alias("wau")
    )
    per_month = daily.groupBy("m").agg(
        F.sum("dau").alias("sum_dau"), F.count(F.lit(1)).alias("n_days")
    )
    return per_month.join(monthly, "m").select(
        "m",
        "sum_dau",
        "n_days",
        F.col("wau").cast("long").alias("wau"),
        _micros(
            F.col("sum_dau") * 1.0 / F.col("n_days") / F.col("wau")
        ).alias("stickiness_micros"),
    )


# Each user's 3rd purchase (nth-event extraction). The per-user
# window is the scale-CORRECT shape here — parallelism is the user
# count, groups are tiny — unlike the low-cardinality grouping that
# forces the two-phase rank. Strict (ts, event_id) order for
# deterministic ties.
@register(
    "q_nth_purchase",
    """
    SELECT user_id, ts AS third_purchase_ts, value AS third_purchase_value
    FROM (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 3
    """,
)
def q_nth_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 3)
        .select(
            "user_id",
            F.col("ts").alias("third_purchase_ts"),
            F.col("value").alias("third_purchase_value"),
        )
    )


# 7-day rolling MEDIAN of daily revenue — a holistic (not
# decomposable) rolling statistic. The fact table collapses to day
# grain first; the in-window sort touches at most 7 values per row of
# the TINY daily relation (sort_array over a collected frame). The
# nearest-rank element ceil(n/2) equals DuckDB's quantile_disc(0.5)
# (identity: ceil(n/2) == floor((n+1)/2)), so the oracle is exact.
@register(
    "q_rolling_median",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders GROUP BY 1
    )
    SELECT day, rev_micros,
           CAST(quantile_disc(rev_micros, 0.5) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS med7_micros
    FROM daily
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    vals = F.sort_array(F.collect_list("rev_micros").over(w))
    return daily.select(
        "day",
        "rev_micros",
        F.element_at(vals, F.ceil(F.size(vals) / 2.0).cast("int")).alias(
            "med7_micros"
        ),
    )


# Exact join-output cardinality WITHOUT running the join — the
# other pre-flight diagnostic next to q_key_skew: |A ⋈ B| =
# Σ_k cnt_A(k)·cnt_B(k). Both per-key counts combine map-side; the
# only join is between the two O(distinct keys) count relations, so
# the answer costs two scans + one tiny join however large the
# would-be join output (which is the point — you ask BEFORE paying
# for a 10^14-row blowup).
@register(
    "q_join_cardinality_est",
    """
    WITH a AS (
      SELECT o_orderkey AS k, COUNT(*) AS cnt FROM orders GROUP BY 1
    ), b AS (
      SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS join_rows,
           CAST(COUNT(*) AS BIGINT) AS matching_keys,
           CAST(MAX(a.cnt * b.cnt) AS BIGINT) AS max_key_fanout
    FROM a JOIN b USING (k)
    """,
)
def q_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_a")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_b")
    )
    prod = F.col("cnt_a") * F.col("cnt_b")
    return a.join(b, "k").agg(
        F.sum(prod).alias("join_rows"),
        F.count(F.lit(1)).alias("matching_keys"),
        F.max(prod).alias("max_key_fanout"),
    )


# Triangle count on the co-purchase graph (parts co-occurring in an
# order). The naive open-wedge join explodes on hub nodes — "the
# curse of the last reducer" — so edges are oriented LOW-DEGREE ->
# HIGH-DEGREE first (Suri & Vassilvitskii, WWW'11): every wedge is
# generated at its lowest-degree vertex, bounding per-task work by
# sum(deg^1.5) instead of max(deg^2). Edge building itself is the
# bucketed in-order pair expansion (one groupBy, i<j inside the
# array — the order table never self-joins). The count is
# orientation-invariant, so the oracle uses the simple i<j
# orientation.
@register(
    "q_triangle_count",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_orderkey,
             LEAST(a.l_partkey, b.l_partkey) AS u,
             GREATEST(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (SELECT DISTINCT u, v FROM pairs)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      SELECT 1 FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # undirected edge list via one groupBy + in-array i<j expansion
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    # degree-ordered orientation: lo = lower-degree endpoint
    # (measured: staging the edge list does NOT pay here — the wedge
    # join dominates and AQE already reuses the distinct's exchange
    # across the three consumers)
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    # wedges open at the LOW-degree vertex; close them against the
    # canonical (min, max) edge set
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("a"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("b"))
    wedges = w1.join(w2, "p").filter(F.col("a") < F.col("b"))
    canon = edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    return wedges.join(canon, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# Equal-frequency feature binning (10 bins over order price) — the
# ML-prep discretizer. Rides the two-phase distributed rank, so the
# global total order costs partitions x 1 histogram rows, not a
# single-task sort; bin id is pure arithmetic on (rank, n). Strict
# (price, orderkey) order keeps engines bit-agreed on ties.
@register(
    "q_equifreq_bins",
    f"""
    SELECT o_orderkey, o_totalprice,
           CAST(ceil(rn * 10.0 / n) AS BIGINT) AS bin
    FROM (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               ORDER BY {_MICROS_SQL.format(expr='o_totalprice')}, o_orderkey
             ) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    )
    """,
)
def q_equifreq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = grouped_rank(
        o,
        [],
        [_micros(F.col("o_totalprice")), F.col("o_orderkey")],
        rank_col="rn",
        count_col="n",
    )
    return ranked.select(
        "o_orderkey",
        "o_totalprice",
        F.ceil(F.col("rn") * 10.0 / F.col("n")).cast("long").alias("bin"),
    )


# Leave-one-out target encoding of a categorical feature (order
# priority -> mean total price of the OTHER orders in the category).
# One map-side-combined per-category aggregate broadcast back onto
# the fact scan; the LOO subtraction ((S - y) / (n - 1)) happens in
# exact micros per row, so no row ever sees its own target and no
# window materializes per-category row lists. n==1 categories yield
# NULL (nullif guard — ANSI mode raises on /0 otherwise).
@register(
    "q_target_encoding",
    f"""
    WITH stats AS (
      SELECT o_orderpriority,
             SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS s_micros,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(
             (s_micros - {_MICROS_SQL.format(expr='o_totalprice')}) AS DOUBLE
           ) / nullif(n - 1, 0) / 1000000 AS loo_mean_price
    FROM orders JOIN stats USING (o_orderpriority)
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.sum(_micros(F.col("o_totalprice"))).alias("s_micros"),
        F.count(F.lit(1)).alias("n"),
    )
    return o.join(F.broadcast(stats), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        (
            (F.col("s_micros") - _micros(F.col("o_totalprice"))).cast("double")
            / F.nullif(F.col("n") - 1, F.lit(0))
            / 1000000
        ).alias("loo_mean_price"),
    )


# Language-ID confusion matrix: the classifier eval for q_langid —
# predicted language vs the stored label, with per-cell counts and
# row-normalized rates. One langid pass (all JVM expressions) + one
# tiny groupBy; the rate window runs over the <= |langs|^2 relation.
@register(
    "q_lang_confusion",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS tok FROM documents
    ), scores AS (
      SELECT doc_id, lang,
             {", ".join(_lang_case(lang) for lang in ["en", "de", "fr", "es", "zh"])}
      FROM toks GROUP BY doc_id, lang
    ), pred AS (
      SELECT lang AS actual,
             CASE WHEN score_en >= score_de AND score_en >= score_fr
                       AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es
                       AND score_de >= score_zh THEN 'de'
                  WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
                  WHEN score_es >= score_zh THEN 'es'
                  ELSE 'zh' END AS predicted
      FROM scores
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(COUNT(*) * 1.0
             / SUM(COUNT(*)) OVER (PARTITION BY actual) * 1000000 + 0.5)
             AS BIGINT) AS rate_micros
    FROM pred GROUP BY actual, predicted
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from frames_spark.functions.langid import language_scores

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pred = language_scores(docs, "doc_id", "text").select(
        "doc_id", "predicted"
    )
    cells = (
        docs.select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("actual")
    return cells.select(
        "actual",
        "predicted",
        "n",
        _micros(F.col("n") * 1.0 / F.sum("n").over(w)).alias("rate_micros"),
    )


# Deterministic A/B conversion lift: users split into arms by a
# content-hash parity (layout-invariant, the same trick as
# q_train_test_split), conversion = >= 10 purchase events (the raw
# did-purchase flag is vacuously 100% in this corpus, which would
# zero the pooled variance). All counts are exact; lift and the
# pooled two-proportion z statistic are one double expression each
# over those ints (sqrt is IEEE correctly-rounded), micros-quantized
# at the end; nullif guards keep degenerate arms NULL instead of
# raising under ANSI.
@register(
    "q_abtest_lift",
    """
    WITH arms AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       >= 10 THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1
    ), agg AS (
      SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c_b
      FROM arms
    )
    SELECT n_a, n_b, c_a, c_b,
           CAST(FLOOR((c_b * 1.0 / n_b) / nullif(c_a * 1.0 / n_a, 0) * 1000000
                - 1000000 + 0.5) AS BIGINT) AS lift_micros,
           CAST(FLOOR((c_b * 1.0 / n_b - c_a * 1.0 / n_a)
             / nullif(sqrt((c_a + c_b) * 1.0 / (n_a + n_b)
                    * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0) * 1000000 + 0.5) AS BIGINT)
             AS z_micros
    FROM agg
    """,
)
def q_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    arms = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 10,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn("arm", arm)
    agg = arms.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0)).alias("c_b"),
    )
    rate_a = F.col("c_a") * 1.0 / F.col("n_a")
    rate_b = F.col("c_b") * 1.0 / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z = (rate_b - rate_a) / F.nullif(
        F.sqrt(
            pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return agg.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        F.floor(rate_b / F.nullif(rate_a, F.lit(0.0)) * 1000000 - 1000000 + 0.5)
        .cast("long")
        .alias("lift_micros"),
        _micros(z).alias("z_micros"),
    )


# PCA projection of the embedding corpus onto its top-2 principal
# axes (similarity/pca.py). Distributed where data-sized (exact
# fixed-point covariance, scan-stage projection), driver-side where
# tiny (the 64x64 eigensolve — distributing it would be theater).
# Rows-only: no portable SQL eigensolve exists; the quantitative
# witness is tests/test_pca.py's pin against an independent
# numpy-only PCA (projections equal, variance order correct).
@register("q_embed_pca")
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.pca import fit_pca, project_pca

    e = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(e, "embedding", k=2)
    proj = project_pca(e, "embedding", model)
    return proj.select(
        "vec_id",
        _micros(F.col("pc1")).alias("pc1_micros"),
        _micros(F.col("pc2")).alias("pc2_micros"),
    )


# MinHash calibration curve: candidate pairs bucketed by the
# signature estimate, with the mean EXACT Jaccard per bucket — the
# plot that tells you where to put the LSH threshold. Pure reuse of
# the q_minhash_accuracy relation (candidate pairs only, never all
# pairs); the aggregate runs over <= 11 buckets. Means divide sums of
# micros-quantized exact ints, so the curve is bit-stable.
@register(
    "q_minhash_calibration",
    f"""
    SELECT CAST(FLOOR(est_jaccard * 10) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM({_MICROS_SQL.format(expr='est_jaccard')}) AS DOUBLE)
             / COUNT(*) / 1000000 AS mean_est,
           CAST(SUM({_MICROS_SQL.format(expr='exact_jaccard')}) AS DOUBLE)
             / COUNT(*) / 1000000 AS mean_exact
    FROM ({{acc}}) acc
    GROUP BY 1
    """.format(acc="{acc}"),
)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    acc = q_minhash_accuracy(spark, sf_dir)
    return (
        acc.groupBy(
            F.floor(F.col("est_jaccard") * 10).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(_micros(F.col("est_jaccard"))).cast("double")
                / F.count(F.lit(1))
                / 1000000
            ).alias("mean_est"),
            (
                F.sum(_micros(F.col("exact_jaccard"))).cast("double")
                / F.count(F.lit(1))
                / 1000000
            ).alias("mean_exact"),
        )
    )


ORACLES["q_minhash_calibration"] = ORACLES["q_minhash_calibration"].format(
    acc=ORACLES["q_minhash_accuracy"]
)


# Degree distribution of the co-purchase graph — the first thing you
# look at before any graph algorithm (it decides whether degree-
# ordered orientation, salting, or plain joins are needed). Edges via
# the same no-self-join expansion as q_triangle_count; two map-side-
# combined groupBys after that.
@register(
    "q_degree_dist",
    """
    WITH pairs AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
             GREATEST(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT n, COUNT(*) AS degree FROM (
        SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY n
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# END-TO-END product-analytics pipeline (pipelines/product.py):
# sessionize -> per-user engagement rollup -> recency vs corpus
# horizon -> rule-based segment, one lazy plan with a full
# cross-engine oracle — the analytics twin of q_pipeline_clean.
@register(
    "q_pipeline_product",
    """
    WITH sessions AS (
      SELECT user_id, value, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT event_id, user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR date_diff('second',
                                      CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP),
                                      CAST(ts AS TIMESTAMP)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    ), per_user AS (
      SELECT user_id,
             CAST(MAX(session_id) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_value_micros,
             MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
      FROM sessions GROUP BY user_id
    ), horizon AS (
      SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us FROM events
    )
    SELECT user_id, n_sessions, n_events, total_value_micros,
           CAST((max_us - last_us) // 86400000000 AS BIGINT) AS recency_days,
           CASE WHEN (max_us - last_us) // 86400000000 <= 7
                     AND n_sessions >= 30 THEN 'core'
                WHEN (max_us - last_us) // 86400000000 <= 7 THEN 'engaged'
                WHEN (max_us - last_us) // 86400000000 <= 14 THEN 'lapsing'
                ELSE 'dormant' END AS segment
    FROM per_user CROSS JOIN horizon
    """,
)
def q_pipeline_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.pipelines.product import engagement_segments

    ev = load_table(spark, sf_dir, "events")
    return engagement_segments(ev)


# Event-type co-occurrence PMI within sessions — "which behaviors go
# together". Sessions from the standard lag+cumsum pass; each
# session's DISTINCT type set collapses in one groupBy and pairs
# expand IN-ARRAY (i<j over the sorted set, never a session-level
# self-join); marginals and the session total are tiny broadcasts.
# ln() micros-quantized as usual.
@register(
    "q_cooccurrence_pmi",
    """
    WITH marked AS (
      SELECT user_id, event_type, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR date_diff('second',
                                    CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP),
                                    CAST(ts AS TIMESTAMP)) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), st AS (
      SELECT DISTINCT user_id, session_id, event_type FROM sess
    ), singles AS (
      SELECT event_type, COUNT(*) AS n FROM st GROUP BY 1
    ), total AS (
      SELECT COUNT(DISTINCT (user_id, session_id)) AS s FROM st
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(FLOOR(ln(s * 1.0 * n_ab / (sa.n * 1.0 * sb.n)) * 1000000
                + 0.5) AS BIGINT) AS pmi_micros
    FROM pairs
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b
    CROSS JOIN total
    """,
)
def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = win_ops.sessionize(
        ev, "user_id", "ts", 1800, order_tiebreak=["event_id"]
    )
    st = sess.select("user_id", "session_id", "event_type").distinct()
    per_session = st.groupBy("user_id", "session_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    pairs = (
        per_session.select(
            F.explode(
                F.expr(
                    "flatten(transform(types, (x, i) -> "
                    "transform(slice(types, i + 2, size(types) - i - 1), "
                    "y -> struct(x AS type_a, y AS type_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = per_session.agg(F.count(F.lit(1)).alias("s"))
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    pmi = F.log(
        F.col("s") * 1.0 * F.col("n_ab") / (F.col("n_a") * 1.0 * F.col("n_b"))
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(total))
        .select("type_a", "type_b", "n_ab", _micros(pmi).alias("pmi_micros"))
    )


# 2-D histogram (price x quantity bins over lineitem) — the heatmap
# feed. One map-side-combined groupBy over integer bin ids; output is
# O(bins^2) rows however large the fact table.
@register(
    "q_histogram_2d",
    f"""
    SELECT {_MICROS_SQL.format(expr='l_extendedprice')} // 10000000000 AS price_bin,
           CAST(l_quantity AS BIGINT) AS qty_bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.expr(
            f"{_MICROS_SQL.format(expr='l_extendedprice')} DIV 10000000000"
        ).alias("price_bin"),
        F.col("l_quantity").cast("long").alias("qty_bin"),
    ).agg(F.count(F.lit(1)).alias("n"))


# Cohort LTV: purchase revenue by (first-seen week, weeks since) —
# the monetary counterpart of q_cohort_retention. Same exchange
# chain: everything keys on user_id until the tiny cohort matrix.
@register(
    "q_ltv_cohort",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT cohort,
           CAST(date_diff('day', cohort,
                CAST(date_trunc('week', ts) AS TIMESTAMP)) // 7 AS BIGINT)
             AS weeks_since,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_micros,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
    FROM events JOIN firsts USING (user_id)
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    weeks_since = F.expr(
        "CAST(datediff(date_trunc('week', ts), cohort) DIV 7 AS BIGINT)"
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy("cohort", weeks_since.alias("weeks_since"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
            ).alias("revenue_micros"),
            F.count_distinct("user_id").alias("n_buyers"),
        )
    )


# Weekly activity-level migration matrix: each active (user, week)
# labeled heavy/light by event count, crossed with the SAME user's
# level in the NEXT calendar week ('churn' if absent). One lead
# window keyed by user over the distinct user-week relation — no
# week-over-week self-join; the matrix is at most levels^2 rows. The
# final observed week is excluded via a 1-row horizon broadcast.
@register(
    "q_segment_migration",
    """
    WITH uw AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
             CASE WHEN COUNT(*) >= 15 THEN 'heavy' ELSE 'light' END AS lvl
      FROM events GROUP BY 1, 2
    ), nxt AS (
      SELECT user_id, wk, lvl,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk,
             LEAD(lvl) OVER (PARTITION BY user_id ORDER BY wk) AS next_lvl
      FROM uw
    ), horizon AS (SELECT MAX(wk) AS max_wk FROM uw)
    SELECT lvl AS from_lvl,
           CASE WHEN next_wk = wk + INTERVAL 7 DAYS THEN next_lvl
                ELSE 'churn' END AS to_lvl,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nxt CROSS JOIN horizon
    WHERE wk < max_wk
    GROUP BY 1, 2
    """,
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uw = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(
        F.when(F.count(F.lit(1)) >= 15, "heavy")
        .otherwise("light")
        .alias("lvl")
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    nxt = uw.select(
        "user_id",
        "wk",
        "lvl",
        F.lead("wk").over(w).alias("next_wk"),
        F.lead("lvl").over(w).alias("next_lvl"),
    )
    horizon = uw.groupBy().agg(F.max("wk").alias("max_wk"))
    to_lvl = F.when(
        F.col("next_wk") == F.col("wk") + F.expr("INTERVAL 7 DAYS"),
        F.col("next_lvl"),
    ).otherwise("churn")
    return (
        nxt.crossJoin(F.broadcast(horizon))
        .filter(F.col("wk") < F.col("max_wk"))
        .groupBy(F.col("lvl").alias("from_lvl"), to_lvl.alias("to_lvl"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Daily revenue split by new vs returning buyers — the monetary
# companion of q_new_vs_returning. Purchase revenue collapses to
# (user, day) grain first; first-seen derives from the ACTIVITY
# relation (any event type), both shuffles keyed user_id.
@register(
    "q_revenue_new_vs_returning",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ), fs AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
    rev AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS rev_micros
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT day,
           CAST(SUM(CASE WHEN day = first_day THEN rev_micros ELSE 0 END)
                AS BIGINT) AS new_rev_micros,
           CAST(SUM(CASE WHEN day > first_day THEN rev_micros ELSE 0 END)
                AS BIGINT) AS returning_rev_micros
    FROM rev JOIN fs USING (user_id)
    GROUP BY day
    """,
)
def q_revenue_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    ud = ev.select("user_id", day.alias("day")).distinct()
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day.alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
            ).alias("rev_micros")
        )
    )
    return (
        rev.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), F.col("rev_micros")).otherwise(0)
            ).alias("new_rev_micros"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), F.col("rev_micros")).otherwise(0)
            ).alias("returning_rev_micros"),
        )
    )


from frames_spark.operators.ranking import grouped_prefix_sum  # noqa: E402


# ABC inventory classification: parts ranked by revenue, classified
# by cumulative share (A <= 80%, B <= 95%, C rest). The running sum
# over the revenue order rides grouped_prefix_sum — the two-phase
# VALUE prefix sum (histogram offsets, parallelism = partitions) —
# never a single-task `SUM() OVER (ORDER BY ...)` on the part
# relation; class thresholds compare exact integers (5*cum <=
# 4*total), no float shares.
@register(
    "q_abc_analysis",
    f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice')}) AS BIGINT)
               AS rev_micros
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT l_partkey, rev_micros,
             SUM(rev_micros) OVER (ORDER BY rev_micros DESC, l_partkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev,
             SUM(rev_micros) OVER () AS total
      FROM per_part
    )
    SELECT l_partkey, rev_micros,
           CASE WHEN 5 * cum_rev <= 4 * total THEN 'A'
                WHEN 20 * cum_rev <= 19 * total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_micros(F.col("l_extendedprice"))).alias("rev_micros")
    )
    # per_part is shuffle-fed — stage the range exchange so both
    # prefix-sum branches see one evaluation (caught live on
    # q_mann_whitney at sf0.1: unstaged, the branches' partition ids
    # diverged and corrupted offsets)
    cum = grouped_prefix_sum(
        per_part,
        [],
        [F.col("rev_micros").desc(), F.col("l_partkey")],
        "rev_micros",
        cum_col="cum_rev",
        total_col="total",
        stage=True,
    )
    cls = (
        F.when(5 * F.col("cum_rev") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum_rev") <= 19 * F.col("total"), "B")
        .otherwise("C")
    )
    return cum.select("l_partkey", "rev_micros", cls.alias("abc_class"))


# Exact weighted median (price weighted by quantity) — the prefix-sum
# primitive again: cumulative weight along the price order, answer =
# first price where 2*cum_weight >= total_weight. No value buffering,
# no single-task sort; all integer compares.
@register(
    "q_weighted_median",
    f"""
    WITH w AS (
      SELECT {_MICROS_SQL.format(expr='l_extendedprice')} AS price_micros,
             CAST(l_quantity AS BIGINT) AS wt, l_orderkey, l_linenumber
      FROM lineitem
    ), cum AS (
      SELECT price_micros, wt,
             SUM(wt) OVER (ORDER BY price_micros, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_wt,
             SUM(wt) OVER () AS total_wt
      FROM w
    )
    SELECT CAST(MIN(price_micros) AS BIGINT) AS wmedian_price_micros,
           CAST(MIN(total_wt) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cum_wt >= total_wt
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        _micros(F.col("l_extendedprice")).alias("price_micros"),
        F.col("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = grouped_prefix_sum(
        li,
        [],
        ["price_micros", "l_orderkey", "l_linenumber"],
        "wt",
        cum_col="cum_wt",
        total_col="total_wt",
    )
    return (
        cum.filter(2 * F.col("cum_wt") >= F.col("total_wt"))
        .agg(
            F.min("price_micros").alias("wmedian_price_micros"),
            F.min("total_wt").alias("total_weight"),
        )
    )


# TIME-CONSTRAINED funnel: view -> click within 1h -> purchase
# within 24h of a qualifying click (the strict version of the
# first-touch funnel — credit expires). Each constraint is one
# backward as-of join with tolerance (operators/asof.py: the
# union-window trick — ONE shuffle per stage, keyed by user, no
# range self-join): "a view exists within [click-1h, click]" iff the
# LAST prior view is within tolerance. The oracle states the same
# thing as EXISTS windows.
@register(
    "q_funnel_windowed",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    qc AS (
      SELECT c.user_id, c.ts FROM c
      WHERE EXISTS (SELECT 1 FROM v
                    WHERE v.user_id = c.user_id
                      AND v.ts <= c.ts
                      AND v.ts >= c.ts - INTERVAL 1 HOUR)
    ),
    qp AS (
      SELECT p.user_id FROM p
      WHERE EXISTS (SELECT 1 FROM qc
                    WHERE qc.user_id = p.user_id
                      AND qc.ts <= p.ts
                      AND qc.ts >= p.ts - INTERVAL 24 HOURS)
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT) AS n_view_users,
           CAST((SELECT COUNT(DISTINCT user_id) FROM qc) AS BIGINT) AS n_click_users,
           CAST((SELECT COUNT(DISTINCT user_id) FROM qp) AS BIGINT) AS n_purchase_users
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("vid"),
        F.lit(1).alias("v_hit"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # stage 1: last view within 1h before each click
    qc = asof_join(
        clicks,
        views,
        key="user_id",
        ts="ts",
        value_cols=["v_hit"],
        right_tiebreak="vid",
        direction="backward",
        tolerance_micros=3600 * 1_000_000,
    ).filter(F.col("v_hit").isNotNull()).select(
        "user_id", "ts", F.col("event_id").alias("cid"),
        F.lit(1).alias("c_hit"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    qp = asof_join(
        purchases,
        qc,
        key="user_id",
        ts="ts",
        value_cols=["c_hit"],
        right_tiebreak="cid",
        direction="backward",
        tolerance_micros=24 * 3600 * 1_000_000,
    ).filter(F.col("c_hit").isNotNull())
    nv = views.agg(F.count_distinct("user_id").alias("n_view_users"))
    nc = qc.agg(F.count_distinct("user_id").alias("n_click_users"))
    np_ = qp.agg(F.count_distinct("user_id").alias("n_purchase_users"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


# Linear multi-touch attribution: each purchase's value split evenly
# across its qualifying touches (view/click within the prior 24h);
# purchases with no touch report as 'unattributed'. The touch-to-
# purchase pairing is the BUCKETED range join (operators/rangejoin.py
# — touch side explodes x2 into window buckets, pure equi-join +
# residual, never a per-user product); per-purchase touch counts come
# from one map-side-combined groupBy and the per-pair credit is
# micros-quantized before the final by-type sum.
@register(
    "q_attribution",
    f"""
    WITH t AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')
    ), p AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ), pairs AS (
      SELECT p.event_id AS pid, p.value, t.event_type AS touch_type
      FROM p JOIN t ON t.user_id = p.user_id
        AND t.ts <= p.ts AND epoch_us(CAST(p.ts AS TIMESTAMP))
            <= epoch_us(CAST(t.ts AS TIMESTAMP)) + 86400000000
    ), per_p AS (
      SELECT pid, COUNT(*) AS n FROM pairs GROUP BY 1
    ), credited AS (
      SELECT touch_type, {_MICROS_SQL.format(expr='value / n')} AS credit
      FROM pairs JOIN per_p USING (pid)
      UNION ALL
      SELECT 'unattributed', {_MICROS_SQL.format(expr='value')}
      FROM p WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pid = p.event_id)
    )
    SELECT touch_type, CAST(SUM(credit) AS BIGINT) AS credit_micros,
           CAST(COUNT(*) AS BIGINT) AS n_credits
    FROM credited GROUP BY touch_type
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("pid"),
        "value",
    )
    pairs = range_join(
        touches, purch, "user_id", "t_ts", "p_ts", 86400
    ).select("pid", "value", "touch_type")
    per_p = pairs.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    credited = pairs.join(per_p, "pid").select(
        "touch_type", _micros(F.col("value") / F.col("n")).alias("credit")
    )
    unattr = (
        purch.join(per_p, "pid", "left_anti")
        .select(
            F.lit("unattributed").alias("touch_type"),
            _micros(F.col("value")).alias("credit"),
        )
    )
    return (
        credited.unionByName(unattr)
        .groupBy("touch_type")
        .agg(
            F.sum("credit").alias("credit_micros"),
            F.count(F.lit(1)).alias("n_credits"),
        )
    )


# Sample-based estimation with an error bar: total revenue estimated
# from a deterministic 1-in-16 content-hash sample, with the normal-
# approximation 95% CI half-width. The 100 TB pattern: the full scan
# is replaced by a scan-stage hash filter (layout-invariant, same
# predicate shape as q_sample_hash); the estimate and its variance
# are exact-integer sums over the sample, combined in one double
# expression per output column.
@register(
    "q_sample_estimate",
    f"""
    WITH s AS (
      SELECT {_MICROS_SQL.format(expr='o_totalprice')} AS v
      FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                 AS BIGINT) % 16 = 0
    ), m AS (
      SELECT COUNT(*) AS n, SUM(v) AS sv, SUM(CAST(v AS HUGEINT) * v) AS svv
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS sample_n,
           CAST(16 * sv AS BIGINT) AS est_total_micros,
           CAST(FLOOR(16 * sqrt(n * 1.0)
                * sqrt((svv - sv * 1.0 / n * sv) / (n - 1)) * 1.96 + 0.5)
                AS BIGINT) AS ci95_micros
    FROM m
    """,
)
def q_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    in_sample = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 16
        == 0
    )
    s = o.filter(in_sample).select(
        _micros(F.col("o_totalprice")).alias("v")
    )
    m = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("svv"),
    )
    # sample variance in exact decimals -> one double sqrt chain
    var = (
        F.col("svv").cast("double")
        - F.col("sv") * 1.0 / F.col("n") * F.col("sv")
    ) / (F.col("n") - 1)
    return m.select(
        F.col("n").cast("long").alias("sample_n"),
        (16 * F.col("sv")).cast("long").alias("est_total_micros"),
        F.floor(
            16 * F.sqrt(F.col("n") * 1.0) * F.sqrt(var) * 1.96 + 0.5
        )
        .cast("long")
        .alias("ci95_micros"),
    )


# Top session paths: the 3 first event types of each session as an
# ordered path string, counted corpus-wide — lightweight sequence
# mining. Sessions from the standard pass; the path builds in ONE
# per-session aggregate (sorted struct collect -> slice -> join), and
# the count is a map-side-combined groupBy over path strings.
@register(
    "q_funnel_paths",
    """
    WITH marked AS (
      SELECT user_id, event_type, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR date_diff('second',
                                    CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP),
                                    CAST(ts AS TIMESTAMP)) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, event_type, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(list_slice(
               list_sort(list_zip(list(ts), list(event_id), list(event_type)))
                 .apply(x -> x[3]), 1, 3), '>') AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    """,
)
def q_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = win_ops.sessionize(
        ev, "user_id", "ts", 1800, order_tiebreak=["event_id"]
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))


# Per-group exact quartiles (p25/p50/p75) in ONE two-phase-rank pass:
# the nearest-rank positions become a 3-way IN filter on the rank —
# no percentile() value buffering, no second scan per quantile.
@register(
    "q_group_quantiles",
    f"""
    WITH r AS (
      SELECT c_mktsegment, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY {_MICROS_SQL.format(expr='o_totalprice')}, o_orderkey)
               AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment,
           CAST(CASE WHEN rn = ceil(0.25 * n) THEN 0.25
                WHEN rn = ceil(0.5 * n) THEN 0.5
                ELSE 0.75 END AS DOUBLE) AS p,
           o_totalprice AS price
    FROM r
    WHERE rn IN (ceil(0.25 * n), ceil(0.5 * n), ceil(0.75 * n))
    """,
)
def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(
        c, F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", "o_totalprice", "o_orderkey")
    ranked = grouped_rank(
        joined,
        ["c_mktsegment"],
        [_micros(F.col("o_totalprice")), F.col("o_orderkey")],
        rank_col="rn",
        count_col="n",
    )
    pos = [F.ceil(p * F.col("n")) for p in (0.25, 0.5, 0.75)]
    label = (
        F.when(F.col("rn") == pos[0], 0.25)
        .when(F.col("rn") == pos[1], 0.5)
        .otherwise(0.75)
    )
    return (
        ranked.filter(
            (F.col("rn") == pos[0])
            | (F.col("rn") == pos[1])
            | (F.col("rn") == pos[2])
        )
        .select(
            "c_mktsegment",
            label.alias("p"),
            F.col("o_totalprice").alias("price"),
        )
    )


# Year-over-year monthly revenue growth: the classic OLAP report.
# One month-grain fact aggregate; the lag-12 window runs over the
# tiny monthly relation only; growth divides exact micros (nullif
# guards the first year under ANSI).
@register(
    "q_year_over_year",
    f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders GROUP BY 1
    )
    SELECT m, rev_micros,
           LAG(rev_micros, 12) OVER (ORDER BY m) AS prior_micros,
           CAST(FLOOR((rev_micros - LAG(rev_micros, 12) OVER (ORDER BY m))
                * 1.0 / nullif(LAG(rev_micros, 12) OVER (ORDER BY m), 0)
                * 1000000 + 0.5) AS BIGINT) AS yoy_growth_micros
    FROM monthly
    """,
)
def q_year_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    w = Window.orderBy("m")
    prior = F.lag("rev_micros", 12).over(w)
    return monthly.select(
        "m",
        "rev_micros",
        prior.alias("prior_micros"),
        _micros(
            (F.col("rev_micros") - prior)
            * 1.0
            / F.nullif(prior, F.lit(0))
        ).alias("yoy_growth_micros"),
    )


# Product-quantization ANN (similarity/pq.py): 16 sub-codebooks of
# 32 centroids -> 16 small codes per vector (16x compression), ADC
# shortlist of 100, exact fixed-point cosine re-rank. Rows-only
# (iterative codebook training); tests/test_pq.py pins recall@10
# against the exact search and code layout-invariance.
@register("q_ann_pq")
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.pq import encode_pq, fit_pq, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cb = fit_pq(emb, "vec_id", "embedding", m=16, k=32)
    codes = encode_pq(emb, "vec_id", "embedding", cb)
    return pq_topk(
        codes,
        cb,
        emb.filter(F.col("vec_id") < 3),
        "vec_id",
        "embedding",
        k=10,
        corpus=emb,
        rerank=100,
    )


# IVF-ADC: coarse IVF cells + PQ-coded residuals + exact re-rank —
# the production composite index (similarity/pq.py ivfpq_topk).
# Rows-only (two iterative trainings); tests pin recall vs exact,
# full-probe equality, and nprobe monotonicity.
@register("q_ann_ivfpq")
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 3),
        "vec_id",
        "embedding",
        k=10,
        n_centroids=8,
        nprobe=3,
    )


# Distribution drift between the first and last week of events
# (Kolmogorov-Smirnov over binned purchase values) — the data-quality
# gate a 100 TB ingest runs before trusting a new shard. Bins are
# exact integer micros buckets; both periods' cumulative shares come
# from one groupBy + a window over the TINY bin relation; the KS
# statistic is the max |cdf gap|, micros-quantized.
@register(
    "q_drift_ks",
    """
    WITH ev AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00' THEN 'a'
                  WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'b'
             END AS period,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) // 2000000 AS bin
      FROM events WHERE event_type = 'purchase'
    ), counts AS (
      SELECT period, bin, COUNT(*) AS n FROM ev
      WHERE period IS NOT NULL GROUP BY 1, 2
    ), cum AS (
      SELECT period, bin,
             SUM(n) OVER (PARTITION BY period ORDER BY bin) AS c,
             SUM(n) OVER (PARTITION BY period) AS tot
      FROM counts
    ), grid AS (
      SELECT DISTINCT bin FROM counts
    ), cdfs AS (
      SELECT g.bin,
             MAX(CASE WHEN period = 'a' THEN c * 1.0 / tot END) AS cdf_a,
             MAX(CASE WHEN period = 'b' THEN c * 1.0 / tot END) AS cdf_b
      FROM grid g LEFT JOIN cum ON cum.bin <= g.bin
      GROUP BY g.bin
    )
    SELECT CAST(FLOOR(MAX(ABS(coalesce(cdf_a, 0) - coalesce(cdf_b, 0)))
           * 1000000 + 0.5) AS BIGINT) AS ks_micros
    FROM cdfs
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    period = F.when(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"), "a"
    ).when(
        F.col("ts") >= F.lit("2024-01-22 00:00:00").cast("timestamp"), "b"
    )
    binned = ev.select(
        period.alias("period"),
        F.expr(
            "CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) DIV 2000000"
        ).alias("bin"),
    ).filter(F.col("period").isNotNull())
    counts = binned.groupBy("period", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = Window.partitionBy("period").orderBy("bin")
    wtot = Window.partitionBy("period")
    cum = counts.select(
        "period",
        "bin",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wtot).alias("tot"),
    )
    grid = counts.select("bin").distinct()
    # evaluate both CDFs on the union grid: for each grid bin, the
    # latest cumulative at-or-below it (join over the tiny bins only)
    cdfs = (
        grid.alias("g")
        .join(cum.alias("c"), F.col("c.bin") <= F.col("g.bin"), "left")
        .groupBy(F.col("g.bin").alias("bin"))
        .agg(
            F.max(
                F.when(
                    F.col("period") == "a",
                    F.col("c") * 1.0 / F.col("tot"),
                )
            ).alias("cdf_a"),
            F.max(
                F.when(
                    F.col("period") == "b",
                    F.col("c") * 1.0 / F.col("tot"),
                )
            ).alias("cdf_b"),
        )
    )
    return cdfs.agg(
        _micros(
            F.max(
                F.abs(
                    F.coalesce(F.col("cdf_a"), F.lit(0.0))
                    - F.coalesce(F.col("cdf_b"), F.lit(0.0))
                )
            )
        ).alias("ks_micros")
    )


# Population stability index over the same periods/bins — the
# ML-monitoring standard (PSI < 0.1 stable, > 0.25 shifted). Shares
# are Laplace-smoothed (+1 per bin) so empty cells can't produce
# ln(0); terms are micros-quantized before the sum (libm guard).
@register(
    "q_psi",
    """
    WITH ev AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00' THEN 'a'
                  WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'b'
             END AS period,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) // 2000000 AS bin
      FROM events WHERE event_type = 'purchase'
    ), counts AS (
      SELECT period, bin, COUNT(*) AS n FROM ev
      WHERE period IS NOT NULL GROUP BY 1, 2
    ), grid AS (SELECT DISTINCT bin FROM counts),
    tots AS (
      SELECT CAST(SUM(CASE WHEN period = 'a' THEN n ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN period = 'b' THEN n ELSE 0 END) AS BIGINT) AS nb,
             CAST(COUNT(DISTINCT bin) AS BIGINT) AS k
      FROM counts
    ), cells AS (
      SELECT g.bin,
             CAST(coalesce(MAX(CASE WHEN period = 'a' THEN n END), 0) + 1 AS BIGINT) AS ca,
             CAST(coalesce(MAX(CASE WHEN period = 'b' THEN n END), 0) + 1 AS BIGINT) AS cb
      FROM grid g LEFT JOIN counts c ON c.bin = g.bin
      GROUP BY g.bin
    )
    SELECT CAST(SUM(CAST(FLOOR(
             (ca * 1.0 / (na + k) - cb * 1.0 / (nb + k))
             * ln(ca * 1.0 / (na + k) / (cb * 1.0 / (nb + k)))
             * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS psi_micros_sum
    FROM cells CROSS JOIN tots
    """,
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    period = F.when(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"), "a"
    ).when(
        F.col("ts") >= F.lit("2024-01-22 00:00:00").cast("timestamp"), "b"
    )
    binned = ev.select(
        period.alias("period"),
        F.expr(
            "CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) DIV 2000000"
        ).alias("bin"),
    ).filter(F.col("period").isNotNull())
    counts = binned.groupBy("period", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = counts.select("bin").distinct()
    tots = counts.agg(
        F.sum(F.when(F.col("period") == "a", F.col("n")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("period") == "b", F.col("n")).otherwise(0)).alias("nb"),
        F.count_distinct("bin").alias("k"),
    )
    cells = (
        grid.join(counts, "bin", "left")
        .groupBy("bin")
        .agg(
            (
                F.coalesce(
                    F.max(F.when(F.col("period") == "a", F.col("n"))),
                    F.lit(0),
                )
                + 1
            ).alias("ca"),
            (
                F.coalesce(
                    F.max(F.when(F.col("period") == "b", F.col("n"))),
                    F.lit(0),
                )
                + 1
            ).alias("cb"),
        )
    )
    pa = F.col("ca") * 1.0 / (F.col("na") + F.col("k"))
    pb = F.col("cb") * 1.0 / (F.col("nb") + F.col("k"))
    term = (pa - pb) * F.log(pa / pb)
    return (
        cells.crossJoin(F.broadcast(tots))
        .agg(F.sum(_micros(term)).alias("psi_micros_sum"))
    )


# Benford first-digit profile of order totals — the classic
# fabricated-data screen. One scan, 9-group aggregate; expected
# Benford shares are log10 constants folded into the plan; the
# deviation is micros-quantized per digit.
@register(
    "q_benford",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ), tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(n * 1.0 / t * 1000000 + 0.5) AS BIGINT) AS share_micros,
           CAST(FLOOR(log10(1 + 1.0 / digit) * 1000000 + 0.5) AS BIGINT)
             AS benford_micros,
           CAST(FLOOR(ABS(n * 1.0 / t - log10(1 + 1.0 / digit)) * 1000000
                + 0.5) AS BIGINT) AS abs_dev_micros
    FROM counts CROSS JOIN tot
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("t"))
    share = F.col("n") * 1.0 / F.col("t")
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        _micros(share).alias("share_micros"),
        _micros(benford).alias("benford_micros"),
        _micros(F.abs(share - benford)).alias("abs_dev_micros"),
    )


# Sparse TF-IDF cosine similarity pairs — the SPARSE-vector
# complement of the dense ANN ladder (classic IR similarity). Scale
# shape: the inverted index joins itself PER TOKEN, and tokens with
# df > max_df (corpus-wide hubs — exactly the tokens that carry no
# signal AND would blow the bucket quadratic) are pruned first, so
# per-token fanout is bounded by max_df^2. Weights are
# milli-quantized ints (tf * ln(N/df)), dots and norms stay exact
# integers; one sqrt at the very end, micros-quantized.
@register(
    "q_sparse_cosine",
    f"""
    WITH tf AS (
      SELECT doc_id AS doc, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents)
      GROUP BY 1, 2
    ), n_docs AS (SELECT COUNT(*) AS n FROM documents),
    dfs AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), w AS (
      SELECT doc, tf.tok,
             CAST(FLOOR(tf * ln(n * 1.0 / df) * 1000 + 0.5) AS BIGINT) AS wq
      FROM tf JOIN dfs ON tf.tok = dfs.tok CROSS JOIN n_docs
      WHERE df BETWEEN 2 AND 50
    ), norms AS (
      SELECT doc, SUM(wq * wq) AS n2 FROM w GROUP BY doc
    ), dots AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.wq * b.wq) AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(FLOOR(dot / sqrt(na.n2 * 1.0) / sqrt(nb.n2 * 1.0)
                * 1000000 + 0.5) AS BIGINT) AS cos_micros
    FROM dots
    JOIN norms na ON na.doc = doc_a
    JOIN norms nb ON nb.doc = doc_b
    WHERE dot / sqrt(na.n2 * 1.0) / sqrt(nb.n2 * 1.0) >= 0.5
    """,
)
def q_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            F.col("doc_id").alias("doc"),
            F.explode(text_fns.tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(dfs, "tok")
        .filter(F.col("df").between(2, 50))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "tok",
            F.floor(
                F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")) * 1000
                + 0.5
            )
            .cast("long")
            .alias("wq"),
        )
    )
    norms = w.groupBy("doc").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    wa = w.select(F.col("doc").alias("doc_a"), "tok", F.col("wq").alias("wa"))
    wb = w.select(F.col("doc").alias("doc_b"), "tok", F.col("wq").alias("wb"))
    dots = (
        wa.join(wb, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("n2").alias("nb2"))
    cos = (
        F.col("dot")
        / F.sqrt(F.col("na2") * 1.0)
        / F.sqrt(F.col("nb2") * 1.0)
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cos >= 0.5)
        .select("doc_a", "doc_b", _micros(cos).alias("cos_micros"))
    )


# PageRank over the co-purchase graph (operators/graph.py) — exact
# integer micros, so rankings are bit-identical across layouts (the
# float formulation drifts with partition order). Rows-only
# (iterative); tests pin determinism, mass conservation bounds and
# degree correlation.
@register("q_pagerank")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    return pagerank(edges, iterations=8)


# Mutual information between event type and weekday — the
# information-theoretic dependence check next to q_chi_square (and
# q_entropy's joint-distribution sibling). Exact contingency counts;
# every term is ln() over ratios of exact longs, micros-quantized
# before the sum; marginals come from windows over the tiny
# |types| x 7 relation.
@register(
    "q_mutual_info",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (SELECT SUM(n) AS t FROM cells),
    marg AS (
      SELECT event_type, dow, n,
             SUM(n) OVER (PARTITION BY event_type) AS nx,
             SUM(n) OVER (PARTITION BY dow) AS ny
      FROM cells
    )
    SELECT CAST(SUM(CAST(FLOOR(
             n * 1.0 / t * ln(n * 1.0 * t / (nx * 1.0 * ny))
             * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_nanos_sum
    FROM marg CROSS JOIN tot
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # Spark dayofweek == DuckDB dayofweek + 1 (Sunday numbering quirk
    # pinned by q_weekday_profile); MI is invariant to the category
    # LABELS, so either numbering yields the same statistic — but the
    # cells must still group identically, so shift to match.
    dow = F.dayofweek(F.col("ts")) - 1
    cells = ev.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("t"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("dow")
    marg = cells.select(
        "n",
        F.sum("n").over(wx).alias("nx"),
        F.sum("n").over(wy).alias("ny"),
    )
    term = (
        F.col("n")
        * 1.0
        / F.col("t")
        * F.log(
            F.col("n") * 1.0 * F.col("t") / (F.col("nx") * 1.0 * F.col("ny"))
        )
    )
    return (
        marg.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.floor(term * 1_000_000_000 + 0.5).cast("long")
            ).alias("mi_nanos_sum")
        )
    )


# Time-series gap filling: a complete DAY SPINE with both standard
# fills — LOCF (last observation carried forward) and linear
# interpolation — over the sparse big-ticket daily revenue series.
# The spine generates with sequence() from a 1-row min/max broadcast
# (never a driver collect); both fills are windows over the tiny
# daily relation; interpolation arithmetic stays in exact integer
# micros and day counts, with nullif guarding the edges under ANSI.
@register(
    "q_gap_fill",
    f"""
    WITH obs AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev_micros
      FROM orders WHERE o_totalprice > 400000 GROUP BY 1
    ), bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM obs
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    ), joined AS (
      SELECT s.day, o.rev_micros FROM spine s LEFT JOIN obs o USING (day)
    ), ctx AS (
      SELECT day, rev_micros,
             last_value(rev_micros IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS locf,
             last_value(CASE WHEN rev_micros IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pd,
             first_value(rev_micros IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nv,
             first_value(CASE WHEN rev_micros IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nd
      FROM joined
    )
    SELECT day, rev_micros, CAST(locf AS BIGINT) AS locf_micros,
           CAST(CASE
             WHEN rev_micros IS NOT NULL THEN rev_micros
             WHEN locf IS NULL OR nv IS NULL THEN NULL
             ELSE locf + (nv - locf)
                  * date_diff('day', pd, day)
                  // nullif(date_diff('day', pd, nd), 0)
           END AS BIGINT) AS interp_micros
    FROM ctx
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    obs = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev_micros"))
    bounds = obs.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    joined = spine.join(obs, "day", "left")
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("rev_micros").isNotNull(), F.col("day"))
    ctx = joined.select(
        "day",
        "rev_micros",
        F.last("rev_micros", ignorenulls=True).over(wb).alias("locf"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("rev_micros", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    span = F.datediff(F.col("nd"), F.col("pd"))
    interp = (
        F.when(F.col("rev_micros").isNotNull(), F.col("rev_micros"))
        .when(F.col("locf").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("locf")
            + F.expr(
                "(nv - locf) * datediff(day, pd) DIV "
                "nullif(datediff(nd, pd), 0)"
            )
        )
    )
    return ctx.select(
        "day",
        "rev_micros",
        F.col("locf").cast("long").alias("locf_micros"),
        interp.cast("long").alias("interp_micros"),
    )


# CUSUM changepoint: the day where cumulative deviation from the
# global daily mean peaks — the standard level-shift detector. The
# fact collapses to day grain first; the mean enters as a 1-row
# broadcast and deviations use the FLOORED integer mean (identical in
# both engines — a float mean would drift in the cusum tail), so the
# whole cusum path is exact longs; argmax via one orderBy-limit over
# the tiny daily relation.
@register(
    "q_cusum_changepoint",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ), m AS (
      SELECT CAST(SUM(rev) // COUNT(*) AS BIGINT) AS mean_rev FROM daily
    ), cusum AS (
      SELECT day, rev,
             SUM(rev - mean_rev) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM daily CROSS JOIN m
    )
    SELECT day AS changepoint_day, CAST(c AS BIGINT) AS cusum_micros,
           CAST(ABS(c) AS BIGINT) AS abs_cusum_micros
    FROM cusum ORDER BY ABS(c) DESC, day LIMIT 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    m = daily.agg(
        F.expr("CAST(SUM(rev) DIV COUNT(*) AS BIGINT)").alias("mean_rev")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = daily.crossJoin(F.broadcast(m)).select(
        "day",
        F.sum(F.col("rev") - F.col("mean_rev")).over(w).alias("c"),
    )
    return (
        cusum.orderBy(F.abs(F.col("c")).desc(), F.col("day"))
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("c").cast("long").alias("cusum_micros"),
            F.abs(F.col("c")).cast("long").alias("abs_cusum_micros"),
        )
    )


# Holt double exponential smoothing of monthly revenue per supplier
# (operators/grouped.py holt_per_key) — order-recursive with TWO
# coupled states, the applyInPandas case, with a FULL recursive-CTE
# oracle: both engines run the identical IEEE recurrence in the
# identical operand order. Monthly sums enter as exact-int-derived
# doubles (int64 -> double is exact below 2^53), so the recursion
# inputs are bit-equal before the first step.
@register(
    "q_holt",
    f"""
    WITH RECURSIVE monthly AS (
      SELECT l_suppkey,
             CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS m,
             CAST(CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice')})
                  AS BIGINT) AS DOUBLE) AS rev
      FROM lineitem GROUP BY 1, 2
    ), base AS (
      SELECT l_suppkey, m, rev,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY m) AS rn
      FROM monthly
    ), rec AS (
      SELECT l_suppkey, m, rev, rn, rev AS level, CAST(0 AS DOUBLE) AS trend
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.l_suppkey, b.m, b.rev, b.rn,
             0.5 * b.rev + (1 - 0.5) * (r.level + r.trend),
             0.3 * ((0.5 * b.rev + (1 - 0.5) * (r.level + r.trend)) - r.level)
               + (1 - 0.3) * r.trend
      FROM base b JOIN rec r ON b.l_suppkey = r.l_suppkey AND b.rn = r.rn + 1
    )
    SELECT l_suppkey, m, rev, level, trend FROM rec
    """,
)
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.grouped import holt_per_key

    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        F.sum(_micros(F.col("l_extendedprice")))
        .cast("double")
        .alias("rev")
    )
    return holt_per_key(
        monthly, "l_suppkey", "m", "rev", alpha=0.5, beta=0.3
    )


# Poisson bootstrap replicate means (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams", Google 2012): the
# DISTRIBUTED bootstrap — resampling with replacement is impossible
# across partitions, but per-row Poisson(1) weights are iid-close and
# embarrassingly parallel. Weights here are DETERMINISTIC (inverse-
# CDF lookup on a per-(row, replicate) md5 hash), so the replicate
# estimates are layout-invariant and fully oracle-checkable. All 20
# replicate sums fuse into ONE aggregate pass; the unpivot at the end
# touches a 1-row relation.
_BOOT_B = 20
# cumulative Poisson(1) thresholds on a 0..9999 hash: P(X<=k)*10000
_POIS = (3678, 7357, 9196, 9809, 9962, 9993, 9998)


def _boot_w_sql(b: int) -> str:
    inner = "concat(CAST(o_orderkey AS VARCHAR), '#', '" + str(b) + "')"
    h = f"({hash60_sql(inner, seed='boot')} % 10000)"
    conds = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS)
    )
    return f"(CASE {conds} ELSE {len(_POIS)} END)"


@register(
    "q_poisson_bootstrap",
    f"""
    WITH sums AS (
      SELECT
        {", ".join(
            f"SUM({_boot_w_sql(b)} * {_MICROS_SQL.format(expr='o_totalprice')}) AS s_{b}, "
            f"SUM({_boot_w_sql(b)}) AS n_{b}"
            for b in range(_BOOT_B)
        )}
      FROM orders
    )
    SELECT CAST(b AS BIGINT) AS b,
           CAST(FLOOR(s * 1.0 / n + 0.5) AS BIGINT) AS mean_micros
    FROM (
      {" UNION ALL ".join(
          f"SELECT {b} AS b, CAST(s_{b} AS BIGINT) AS s, CAST(n_{b} AS BIGINT) AS n FROM sums"
          for b in range(_BOOT_B)
      )}
    )
    """,
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.hashing import hash60

    o = load_table(spark, sf_dir, "orders")
    micros = _micros(F.col("o_totalprice"))

    def w(b: int):
        h = hash60(
            F.concat(
                F.col("o_orderkey").cast("string"), F.lit(f"#{b}")
            ),
            seed="boot",
        ) % 10000
        expr = F.when(h < _POIS[0], 0)
        for k, t in enumerate(_POIS[1:], start=1):
            expr = expr.when(h < t, k)
        return expr.otherwise(len(_POIS))

    aggs = []
    for b in range(_BOOT_B):
        aggs.append(F.sum(w(b) * micros).alias(f"s_{b}"))
        aggs.append(F.sum(w(b)).alias(f"n_{b}"))
    sums = o.agg(*aggs)
    stack = ", ".join(
        f"{b}L, CAST(s_{b} AS BIGINT), CAST(n_{b} AS BIGINT)"
        for b in range(_BOOT_B)
    )
    long = sums.selectExpr(
        f"stack({_BOOT_B}, {stack}) AS (b, s, n)"
    )
    return long.select(
        "b",
        F.floor(F.col("s") * 1.0 / F.col("n") + 0.5)
        .cast("long")
        .alias("mean_micros"),
    )


# Mann-Whitney U (rank-sum) test: do AUTOMOBILE and BUILDING orders
# draw from the same price distribution? Midranks are computed from
# the per-distinct-value counts via the two-phase prefix sum
# (grouped_prefix_sum) — no per-row global ranking, no single-task
# sort — and doubled (2*midrank is integral), so U is EXACT integer
# arithmetic end to end; the normal-approximation z (tie correction
# omitted, standard large-n form) is one double expression at the
# end, micros-quantized.
@register(
    "q_mann_whitney",
    f"""
    WITH seg AS (
      SELECT c_mktsegment AS g, {_MICROS_SQL.format(expr='o_totalprice')} AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ), vals AS (
      SELECT v, COUNT(*) AS cnt,
             SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS cnt_a
      FROM seg GROUP BY v
    ), cum AS (
      SELECT v, cnt, cnt_a,
             SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM vals
    ), tots AS (
      SELECT CAST(SUM(cnt_a) AS BIGINT) AS na,
             CAST(SUM(cnt) - SUM(cnt_a) AS BIGINT) AS nb
      FROM vals
    ), r AS (
      SELECT CAST(SUM(cnt_a * (2 * (c - cnt) + cnt + 1)) AS BIGINT) AS r2_a
      FROM cum
    )
    SELECT na, nb, CAST(r2_a - na * (na + 1) AS BIGINT) AS u2_a,
           CAST(FLOOR(
             (r2_a - na * (na + 1) - na * 1.0 * nb)
             / (2.0 * sqrt(na * 1.0 * nb * (na + nb + 1) / 12.0))
             * 1000000 + 0.5) AS BIGINT) AS z_micros
    FROM r CROSS JOIN tots
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(
            F.col("c_mktsegment").alias("g"),
            _micros(F.col("o_totalprice")).alias("v"),
        )
    )
    vals = seg.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("g") == "AUTOMOBILE", 1).otherwise(0)).alias(
            "cnt_a"
        ),
    )
    # vals is shuffle-fed (groupBy output): the prefix sum's two
    # branches must observe ONE evaluation of the range exchange, so
    # stage it (see grouped_rank's determinism requirement)
    cum = grouped_prefix_sum(vals, [], ["v"], "cnt", cum_col="c", stage=True)
    tots = vals.agg(
        F.sum("cnt_a").alias("na"),
        (F.sum("cnt") - F.sum("cnt_a")).alias("nb"),
    )
    r = cum.agg(
        F.sum(
            F.col("cnt_a")
            * (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("r2_a")
    )
    u2 = F.col("r2_a") - F.col("na") * (F.col("na") + 1)
    z = (
        (u2 - F.col("na") * 1.0 * F.col("nb"))
        / (
            2.0
            * F.sqrt(
                F.col("na")
                * 1.0
                * F.col("nb")
                * (F.col("na") + F.col("nb") + 1)
                / 12.0
            )
        )
    )
    return (
        r.crossJoin(F.broadcast(tots))
        .select(
            "na",
            "nb",
            u2.cast("long").alias("u2_a"),
            _micros(z).alias("z_micros"),
        )
    )


# Pairwise Pearson correlation MATRIX over lineitem's numeric columns
# in ONE fused aggregate pass: all 4 first moments, 4 second moments
# and 6 cross moments are sums in the same map-side-combined agg
# (Catalyst fuses them into one traversal — the Frames fused-fold
# idiom at matrix width). Moments accumulate in DECIMAL(38)/HUGEINT
# exact integers (micros-quantized inputs); each correlation is the
# exact-moments expression over the 1-row relation, unpivoted via
# stack.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q_corr_matrix",
    f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
        {", ".join(f"SUM(CAST({_MICROS_SQL.format(expr=c)} AS HUGEINT)) AS s_{i}" for i, c in enumerate(_CORR_COLS))},
        {", ".join(f"SUM(CAST({_MICROS_SQL.format(expr=c)} AS HUGEINT) * {_MICROS_SQL.format(expr=c)}) AS ss_{i}" for i, c in enumerate(_CORR_COLS))},
        {", ".join(f"SUM(CAST({_MICROS_SQL.format(expr=a)} AS HUGEINT) * {_MICROS_SQL.format(expr=b)}) AS sp_{i}_{j}" for i, a in enumerate(_CORR_COLS) for j, b in enumerate(_CORR_COLS) if i < j)}
      FROM lineitem
    )
    {" UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"CAST(FLOOR((n * sp_{i}_{j} - s_{i} * s_{j}) "
        f"/ sqrt(CAST(n * ss_{i} - s_{i} * s_{i} AS DOUBLE)) "
        f"/ sqrt(CAST(n * ss_{j} - s_{j} * s_{j} AS DOUBLE)) "
        f"* 1000000 + 0.5) AS BIGINT) AS corr_micros FROM m"
        for i, a in enumerate(_CORR_COLS)
        for j, b in enumerate(_CORR_COLS)
        if i < j
    )}
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cols = {i: _micros(F.col(c)) for i, c in enumerate(_CORR_COLS)}
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in cols:
        aggs.append(F.sum(cols[i].cast(dec)).alias(f"s_{i}"))
        aggs.append(F.sum(cols[i].cast(dec) * cols[i]).alias(f"ss_{i}"))
    for i in cols:
        for j in cols:
            if i < j:
                aggs.append(
                    F.sum(cols[i].cast(dec) * cols[j]).alias(f"sp_{i}_{j}")
                )
    m = li.agg(*aggs)
    outs = []
    for i, a in enumerate(_CORR_COLS):
        for j, b in enumerate(_CORR_COLS):
            if i < j:
                num = (
                    F.col("n").cast(dec) * F.col(f"sp_{i}_{j}")
                    - F.col(f"s_{i}") * F.col(f"s_{j}")
                )
                va = (
                    F.col("n").cast(dec) * F.col(f"ss_{i}")
                    - F.col(f"s_{i}") * F.col(f"s_{i}")
                ).cast("double")
                vb = (
                    F.col("n").cast(dec) * F.col(f"ss_{j}")
                    - F.col(f"s_{j}") * F.col(f"s_{j}")
                ).cast("double")
                outs.append(
                    m.select(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.floor(
                            num.cast("double") / F.sqrt(va) / F.sqrt(vb)
                            * 1000000
                            + 0.5
                        )
                        .cast("long")
                        .alias("corr_micros"),
                    )
                )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# Spearman rank correlation (quantity vs price) with EXACT MIDRANKS —
# heavy ties (50 distinct quantities) make the tie-broken row-number
# form wrong, so both columns get midranks from their per-distinct-
# value counts via the staged prefix sum; doubled midranks stay
# integral, the Pearson-on-ranks moments accumulate in
# DECIMAL(38)/HUGEINT, and one double expression closes it. Rank
# tables join back by VALUE (the tiny quantity table broadcasts;
# AQE picks the strategy for the price table).
@register(
    "q_spearman",
    f"""
    WITH rows_ AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             {_MICROS_SQL.format(expr='l_extendedprice')} AS y
      FROM lineitem
    ), vx AS (
      SELECT x, COUNT(*) AS cnt FROM rows_ GROUP BY x
    ), rx AS (
      SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS mr2
      FROM vx
    ), vy AS (
      SELECT y, COUNT(*) AS cnt FROM rows_ GROUP BY y
    ), ry AS (
      SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS mr2
      FROM vy
    ), ranked AS (
      SELECT rx.mr2 AS a, ry.mr2 AS b
      FROM rows_ JOIN rx USING (x) JOIN ry USING (y)
    ), m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(a AS HUGEINT)) AS sa, SUM(CAST(b AS HUGEINT)) AS sb,
             SUM(CAST(a AS HUGEINT) * a) AS saa,
             SUM(CAST(b AS HUGEINT) * b) AS sbb,
             SUM(CAST(a AS HUGEINT) * b) AS sab
      FROM ranked
    )
    SELECT CAST(FLOOR(
             CAST(n * sab - sa * sb AS DOUBLE)
             / sqrt(CAST(n * saa - sa * sa AS DOUBLE))
             / sqrt(CAST(n * sbb - sb * sb AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS rho_micros,
           CAST(n AS BIGINT) AS n
    FROM m
    """,
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        _micros(F.col("l_extendedprice")).alias("y"),
    )

    def midranks(df, col):
        vals = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        cum = grouped_prefix_sum(
            vals, [], [col], "cnt", cum_col="c", stage=True
        )
        return cum.select(
            col,
            (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1).alias(
                "mr2"
            ),
        )

    rx = midranks(rows_, "x").withColumnRenamed("mr2", "a")
    ry = midranks(rows_, "y").withColumnRenamed("mr2", "b")
    ranked = rows_.join(F.broadcast(rx), "x").join(ry, "y")
    dec = "decimal(38,0)"
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a").cast(dec)).alias("sa"),
        F.sum(F.col("b").cast(dec)).alias("sb"),
        F.sum(F.col("a").cast(dec) * F.col("a")).alias("saa"),
        F.sum(F.col("b").cast(dec) * F.col("b")).alias("sbb"),
        F.sum(F.col("a").cast(dec) * F.col("b")).alias("sab"),
    )
    num = (F.col("n").cast(dec) * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    va = (F.col("n").cast(dec) * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    vb = (F.col("n").cast(dec) * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return m.select(
        F.floor(num / F.sqrt(va) / F.sqrt(vb) * 1000000 + 0.5)
        .cast("long")
        .alias("rho_micros"),
        F.col("n").cast("long").alias("n"),
    )


# Welch's t-test + Cohen's d between two customer segments' order
# prices: one fused aggregate computes both groups' exact decimal
# moments (count/sum/sum-of-squares); the t statistic, Welch-
# Satterthwaite degrees of freedom and the effect size are double
# expressions over the 1-row relation, micros-quantized.
@register(
    "q_welch_ttest",
    f"""
    WITH seg AS (
      SELECT c_mktsegment AS g,
             CAST({_MICROS_SQL.format(expr='o_totalprice')} AS HUGEINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ), m AS (
      SELECT
        SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS nb,
        SUM(CASE WHEN g = 'AUTOMOBILE' THEN v ELSE 0 END) AS sa,
        SUM(CASE WHEN g = 'BUILDING' THEN v ELSE 0 END) AS sb,
        SUM(CASE WHEN g = 'AUTOMOBILE' THEN v * v ELSE 0 END) AS saa,
        SUM(CASE WHEN g = 'BUILDING' THEN v * v ELSE 0 END) AS sbb
      FROM seg
    ), v AS (
      SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             sa * 1.0 / na AS ma, sb * 1.0 / nb AS mb,
             CAST(saa - sa * 1.0 / na * sa AS DOUBLE) / (na - 1) AS va,
             CAST(sbb - sb * 1.0 / nb * sb AS DOUBLE) / (nb - 1) AS vb
      FROM m
    )
    SELECT na, nb,
           CAST(FLOOR((ma - mb) / sqrt(va / na + vb / nb) * 1000000 + 0.5)
                AS BIGINT) AS t_micros,
           CAST(FLOOR(pow(va / na + vb / nb, 2)
                / (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1))
                * 1000 + 0.5) AS BIGINT) AS df_millis,
           CAST(FLOOR((ma - mb)
                / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
                * 1000000 + 0.5) AS BIGINT) AS cohen_d_micros
    FROM v
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    seg = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(
            F.col("c_mktsegment").alias("g"),
            _micros(F.col("o_totalprice")).cast(dec).alias("v"),
        )
    )
    is_a = F.col("g") == "AUTOMOBILE"
    m = seg.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(is_a, F.col("v")).otherwise(F.lit(0).cast(dec))).alias("sa"),
        F.sum(F.when(~is_a, F.col("v")).otherwise(F.lit(0).cast(dec))).alias("sb"),
        F.sum(F.when(is_a, F.col("v") * F.col("v")).otherwise(F.lit(0).cast(dec))).alias("saa"),
        F.sum(F.when(~is_a, F.col("v") * F.col("v")).otherwise(F.lit(0).cast(dec))).alias("sbb"),
    )
    ma = F.col("sa") * 1.0 / F.col("na")
    mb = F.col("sb") * 1.0 / F.col("nb")
    va = (F.col("saa") - F.col("sa") * 1.0 / F.col("na") * F.col("sa")).cast(
        "double"
    ) / (F.col("na") - 1)
    vb = (F.col("sbb") - F.col("sb") * 1.0 / F.col("nb") * F.col("sb")).cast(
        "double"
    ) / (F.col("nb") - 1)
    se2 = va / F.col("na") + vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(va / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(vb / F.col("nb"), 2) / (F.col("nb") - 1)
    )
    pooled = F.sqrt(
        ((F.col("na") - 1) * va + (F.col("nb") - 1) * vb)
        / (F.col("na") + F.col("nb") - 2)
    )
    d = (ma - mb) / pooled
    return m.select(
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        _micros(t).alias("t_micros"),
        F.floor(df * 1000 + 0.5).cast("long").alias("df_millis"),
        _micros(d).alias("cohen_d_micros"),
    )


# Odds ratio (2x2): does AUTOMOBILE segment membership change the
# odds of a big order? Exact cell counts in one fused aggregate;
# the OR and its log-SE close over the 1-row relation (Woolf
# interval), micros-quantized.
@register(
    "q_odds_ratio",
    """
    WITH cells AS (
      SELECT
        SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                  AND o_totalprice >= 200000 THEN 1 ELSE 0 END) AS a,
        SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                  AND o_totalprice < 200000 THEN 1 ELSE 0 END) AS b,
        SUM(CASE WHEN c_mktsegment <> 'AUTOMOBILE'
                  AND o_totalprice >= 200000 THEN 1 ELSE 0 END) AS c,
        SUM(CASE WHEN c_mktsegment <> 'AUTOMOBILE'
                  AND o_totalprice < 200000 THEN 1 ELSE 0 END) AS d
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST(FLOOR(a * 1.0 * d / nullif(b * 1.0 * c, 0) * 1000000 + 0.5)
                AS BIGINT) AS odds_ratio_micros,
           CAST(FLOOR(sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d) * 1000000 + 0.5)
                AS BIGINT) AS log_se_micros
    FROM cells
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    auto = F.col("c_mktsegment") == "AUTOMOBILE"
    big = F.col("o_totalprice") >= 200000
    cells = j.agg(
        F.sum(F.when(auto & big, 1).otherwise(0)).alias("a"),
        F.sum(F.when(auto & ~big, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~auto & big, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~auto & ~big, 1).otherwise(0)).alias("d"),
    )
    orr = (
        F.col("a")
        * 1.0
        * F.col("d")
        / F.nullif(F.col("b") * 1.0 * F.col("c"), F.lit(0.0))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "a", "b", "c", "d",
        _micros(orr).alias("odds_ratio_micros"),
        _micros(se).alias("log_se_micros"),
    )


# Repeat-purchase rate: of users who purchased at all, how many
# purchased on 2+ DISTINCT days — the repeat-behavior KPI. The
# distinct (user, day) collapse comes first; two counts over the
# per-user relation close it.
@register(
    "q_repeat_purchase",
    """
    WITH pd AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events WHERE event_type = 'purchase'
    ), per_user AS (
      SELECT user_id, COUNT(*) AS n_days FROM pd GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN n_days >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(FLOOR(SUM(CASE WHEN n_days >= 2 THEN 1 ELSE 0 END) * 1.0
                / COUNT(*) * 1000000 + 0.5) AS BIGINT) AS repeat_rate_micros
    FROM per_user
    """,
)
def q_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pd_ = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    per_user = pd_.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_days"))
    repeat = F.sum(F.when(F.col("n_days") >= 2, 1).otherwise(0))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_buyers"),
        repeat.alias("n_repeat"),
        _micros(repeat * 1.0 / F.count(F.lit(1))).alias(
            "repeat_rate_micros"
        ),
    )


# Zipf exponent of the corpus token distribution: OLS slope of
# ln(freq) on ln(rank) — the one-number summary of vocabulary shape
# (natural text ~ -1). Ranks ride the STAGED two-phase rank over the
# shuffle-fed vocabulary relation (millions of tokens at corpus
# scale — never a single-task window); both ln()s are micros-
# quantized before the exact decimal moment sums (libm guard), and
# the slope closes as one double expression.
@register(
    "q_zipf",
    """
    WITH vocab AS (
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text),
              '\\s+', ' ', 'g')), ' ')) AS tok FROM documents)
      GROUP BY tok
    ), ranked AS (
      SELECT freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM vocab
    ), pts AS (
      SELECT CAST(FLOOR(ln(rnk) * 1000000 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(ln(freq) * 1000000 + 0.5) AS BIGINT) AS y
      FROM ranked
    ), m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * 1000000 + 0.5) AS BIGINT) AS zipf_slope_micros
    FROM m
    """,
)
def q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = grouped_rank(
        vocab,
        [],
        [F.col("freq").desc(), F.col("tok")],
        rank_col="rnk",
        count_col="_n",
        stage=True,
    )
    pts = ranked.select(
        _micros(F.log("rnk")).alias("x"),
        _micros(F.log("freq")).alias("y"),
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    num = (F.col("n").cast(dec) * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.floor(num / den * 1000000 + 0.5).cast("long").alias(
            "zipf_slope_micros"
        ),
    )


# Audience overlap from STORED sketches: |week1 ∩ week4| estimated by
# inclusion-exclusion over HLL unions (|A| + |B| - |A∪B|) — the
# sketch-algebra answer when only the per-window parts exist and the
# raw events are long gone. Rows-only (sketch bytes are engine-
# specific); tests pin the estimate within tolerance of the exact
# overlap, witnessing the algebra end-to-end.
@register("q_sketch_overlap")
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import sketch_parts

    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    lo = ev.agg(F.min(wk).alias("w0"))
    tagged = ev.crossJoin(F.broadcast(lo)).withColumn(
        "wk_idx", F.datediff(wk, F.col("w0")).cast("long") / 7
    )
    parts = sketch_parts(
        tagged.filter(F.col("wk_idx").isin(0.0, 3.0)),
        ["wk_idx"],
        "user_id",
        lgk=14,
    )
    a = parts.filter(F.col("wk_idx") == 0.0).select(
        F.hll_sketch_estimate("sketch").alias("n_a")
    )
    b = parts.filter(F.col("wk_idx") == 3.0).select(
        F.hll_sketch_estimate("sketch").alias("n_b")
    )
    u = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_union")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(u))
        .select(
            F.col("n_a").cast("long").alias("n_week1"),
            F.col("n_b").cast("long").alias("n_week4"),
            F.col("n_union").cast("long").alias("n_union"),
            (F.col("n_a") + F.col("n_b") - F.col("n_union"))
            .cast("long")
            .alias("overlap_est"),
        )
    )


# Herfindahl-Hirschman concentration of supplier revenue within each
# part type — the market-concentration standard (HHI > 2500 =
# concentrated). One fact aggregate on (type, supplier); shares
# square inside exact decimals against the per-type total (window
# over the tiny type x supplier relation), one double division per
# type at the end; share^2 terms are quantized BEFORE the sum so
# partition order can't drift the total.
@register(
    "q_hhi",
    f"""
    WITH rev AS (
      SELECT p_type, l_suppkey,
             CAST(SUM({_MICROS_SQL.format(expr='l_extendedprice')}) AS HUGEINT)
               AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT p_type, r, SUM(r) OVER (PARTITION BY p_type) AS t FROM rev
    )
    SELECT p_type,
           CAST(SUM(CAST(FLOOR(CAST(r AS DOUBLE) / CAST(t AS DOUBLE)
                          * CAST(r AS DOUBLE) / CAST(t AS DOUBLE)
                * 10000000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS hhi_micropoints
    FROM tot GROUP BY p_type
    """,
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dec = "decimal(38,0)"
    rev = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(_micros(F.col("l_extendedprice"))).cast(dec).alias("r"))
    )
    w = Window.partitionBy("p_type")
    tot = rev.select(
        "p_type", "r", F.sum("r").over(w).alias("t")
    )
    # per-term quantization BEFORE the sum: summing raw share^2
    # doubles would drift with partition order (the standard micros
    # rule); 1e10 scale = HHI micro-points on the 0..10000 scale
    share = F.col("r").cast("double") / F.col("t").cast("double")
    return tot.groupBy("p_type").agg(
        F.sum(
            F.floor(share * share * 10_000_000_000 + 0.5).cast("long")
        ).alias("hhi_micropoints")
    )


# Weekday-adjusted daily revenue: divide each day by its day-of-week
# seasonal index (mean-of-weekday / grand mean) — the de-seasonalized
# series trend analyses want. Both the daily series and the 7-row
# index are aggregates; the adjustment joins the tiny index back
# broadcast; index and adjusted values are micros-quantized ratios of
# exact integers.
@register(
    "q_seasonal_adjust",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             dayofweek(o_orderdate) AS dow,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1, 2
    ), idx AS (
      SELECT dow,
             CAST(FLOOR(
               (SUM(rev) * 1.0 / COUNT(*))
               / ((SELECT SUM(rev) FROM daily) * 1.0
                  / (SELECT COUNT(*) FROM daily))
               * 1000000 + 0.5) AS BIGINT) AS index_micros
      FROM daily GROUP BY dow
    )
    SELECT day, rev,
           index_micros,
           CAST((CAST(rev AS HUGEINT) * 1000000 + index_micros // 2)
                // index_micros AS BIGINT) AS adj_rev_micros
    FROM daily JOIN idx USING (dow)
    """,
)
def q_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # align numbering with DuckDB dayofweek (see q_weekday_profile) —
    # here dow is only a JOIN key, so any consistent numbering works,
    # but the column is part of the grouping on both sides
    dow = F.dayofweek(F.col("o_orderdate")) - 1
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        dow.alias("dow"),
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    grand = daily.agg(
        F.sum("rev").alias("g_sum"), F.count(F.lit(1)).alias("g_n")
    )
    idx = (
        daily.groupBy("dow")
        .agg(F.sum("rev").alias("d_sum"), F.count(F.lit(1)).alias("d_n"))
        .crossJoin(F.broadcast(grand))
        .select(
            "dow",
            _micros(
                (F.col("d_sum") * 1.0 / F.col("d_n"))
                / (F.col("g_sum") * 1.0 / F.col("g_n"))
            ).alias("index_micros"),
        )
    )
    # PURE integer rounding division on both engines: rev * 1e6
    # overflows the double mantissa at sf0.1 daily sums, and DuckDB
    # parses 1000000.0 as DECIMAL — mixed float/decimal arithmetic
    # diverged by 1 micro on boundary rows (caught at sf0.1)
    return daily.join(F.broadcast(idx), "dow").select(
        "day",
        "rev",
        "index_micros",
        F.expr(
            "CAST((CAST(rev AS DECIMAL(38,0)) * 1000000 "
            "+ index_micros DIV 2) DIV index_micros AS BIGINT)"
        ).alias("adj_rev_micros"),
    )


# Heaps' law exponent: vocabulary size vs corpus size in doc order —
# the companion corpus law to q_zipf (natural text: V ~ k*N^beta,
# beta ~ 0.4-0.8). First occurrences come from one min-doc-per-token
# aggregate (never a scan of history per doc); both cumulative series
# ride the STAGED prefix sum over the per-doc relation; the log-log
# OLS closes in exact decimal moments over micros-quantized lns.
@register(
    "q_heaps",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
    ), firsts AS (
      SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dummy_tok
      FROM toks GROUP BY tok
    ), new_per_doc AS (
      SELECT doc_id, COUNT(*) AS n_new FROM firsts GROUP BY doc_id
    ), series AS (
      SELECT p.doc_id,
             SUM(p.n_toks) OVER (ORDER BY p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks,
             SUM(coalesce(n.n_new, 0)) OVER (ORDER BY p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
      FROM per_doc p LEFT JOIN new_per_doc n ON p.doc_id = n.doc_id
    ), pts AS (
      SELECT CAST(FLOOR(ln(cum_toks) * 1000000 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(ln(cum_vocab) * 1000000 + 0.5) AS BIGINT) AS y
      FROM series
    ), m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * 1000000 + 0.5) AS BIGINT) AS heaps_beta_micros
    FROM m
    """,
)
def q_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(text_fns.tokens(F.col("text"))).alias("tok")
    )
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = firsts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    base = per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
    )
    s1 = grouped_prefix_sum(
        base, [], ["doc_id"], "n_toks", cum_col="cum_toks", stage=True
    )
    series = grouped_prefix_sum(
        s1, [], ["doc_id"], "n_new", cum_col="cum_vocab", stage=True
    )
    pts = series.select(
        _micros(F.log("cum_toks")).alias("x"),
        _micros(F.log("cum_vocab")).alias("y"),
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    num = (F.col("n").cast(dec) * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.floor(num / den * 1000000 + 0.5).cast("long").alias(
            "heaps_beta_micros"
        ),
    )


# Lorenz curve (revenue share by customer decile) — the plot behind
# q_gini_revenue. Deciles come from the two-phase rank's arithmetic
# (ntile_from_rank); per-decile micros sums are exact; shares divide
# against a 1-row total broadcast.
@register(
    "q_lorenz_points",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS spend
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT spend, NTILE(10) OVER (ORDER BY spend, o_custkey) AS decile
      FROM per_cust
    ), tot AS (SELECT SUM(spend) AS t FROM per_cust)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(SUM(spend) AS BIGINT) AS spend_micros,
           CAST(FLOOR(SUM(spend) * 1.0 / t * 1000000 + 0.5) AS BIGINT)
             AS share_micros
    FROM ranked CROSS JOIN tot
    GROUP BY decile, t
    """,
)
def q_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(_micros(F.col("o_totalprice"))).alias("spend")
    )
    ranked = grouped_rank(
        per_cust,
        [],
        ["spend", "o_custkey"],
        rank_col="rn",
        count_col="n",
        stage=True,  # per_cust is shuffle-fed
    )
    decile = ntile_from_rank(F.col("rn"), F.col("n"), 10)
    tot = per_cust.agg(F.sum("spend").alias("t"))
    return (
        ranked.select(decile.alias("decile"), "spend")
        .groupBy("decile")
        .agg(F.sum("spend").alias("spend_micros"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "spend_micros",
            _micros(F.col("spend_micros") * 1.0 / F.col("t")).alias(
                "share_micros"
            ),
        )
    )


# PMI collocations: adjacent token pairs that co-occur far above
# chance — classic phrase extraction. Bigrams build POSITIONALLY in
# the scan stage (zip of the token array with its tail — no
# posexplode self-join, same trick as q_bigram_logprob); unigram
# marginals join back; PMI = ln(N * n_ab / (n_a * n_b)) over exact
# longs, micros-quantized; min-count filter keeps the tail noise out.
@register(
    "q_collocations",
    f"""
    WITH toks AS (
      SELECT {_TOKENS_SQL} AS ts FROM documents
    ), bigrams AS (
      SELECT unnest(list_zip(ts[1:-2], ts[2:-1])) AS bg FROM toks
    ), bg AS (
      SELECT bg[1] AS w1, bg[2] AS w2, COUNT(*) AS n_ab
      FROM bigrams GROUP BY 1, 2
    ), uni AS (
      SELECT unnest(ts) AS w FROM toks
    ), uc AS (
      SELECT w, COUNT(*) AS n FROM uni GROUP BY w
    ), tot AS (SELECT SUM(n) AS t FROM uc)
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(FLOOR(ln(t * 1.0 * n_ab / (u1.n * 1.0 * u2.n)) * 1000000
                + 0.5) AS BIGINT) AS pmi_micros
    FROM bg JOIN uc u1 ON u1.w = w1 JOIN uc u2 ON u2.w = w2 CROSS JOIN tot
    WHERE n_ab >= 10
    """,
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    ts = text_fns.tokens(F.col("text"))
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(ts, 1, F.size(ts) - 1),
                F.slice(ts, 2, F.size(ts) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    bg = bigrams.groupBy(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    uc = docs.select(F.explode(ts).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = uc.agg(F.sum("n").alias("t"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    pmi = F.log(
        F.col("t") * 1.0 * F.col("n_ab") / (F.col("n1") * 1.0 * F.col("n2"))
    )
    return (
        bg.filter(F.col("n_ab") >= 10)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_ab", _micros(pmi).alias("pmi_micros"))
    )


# Decile lift table: users ranked into spend deciles, heavy-buyer
# rate per decile vs the base rate — the targeting-model evaluation
# standard. Per-user rollup first; deciles from the STAGED two-phase
# rank; rates and lift divide exact longs, micros-quantized.
@register(
    "q_decile_lift",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS spend,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       >= 10 THEN 1 ELSE 0 END AS heavy
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT spend, heavy,
             NTILE(10) OVER (ORDER BY spend DESC, user_id) AS decile
      FROM per_user
    ), base AS (
      SELECT SUM(heavy) * 1.0 / COUNT(*) AS base_rate FROM per_user
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(heavy) AS BIGINT) AS n_heavy,
           CAST(FLOOR(SUM(heavy) * 1.0 / COUNT(*) / base_rate * 1000000
                + 0.5) AS BIGINT) AS lift_micros
    FROM ranked CROSS JOIN base
    GROUP BY decile, base_rate
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(is_p, _micros(F.col("value"))).otherwise(0)
        ).alias("spend"),
        F.when(F.sum(F.when(is_p, 1).otherwise(0)) >= 10, 1)
        .otherwise(0)
        .alias("heavy"),
    )
    ranked = grouped_rank(
        per_user,
        [],
        [F.col("spend").desc(), F.col("user_id")],
        rank_col="rn",
        count_col="n",
        stage=True,
    )
    decile = ntile_from_rank(F.col("rn"), F.col("n"), 10)
    base = per_user.agg(
        (F.sum("heavy") * 1.0 / F.count(F.lit(1))).alias("base_rate")
    )
    return (
        ranked.select(decile.alias("decile"), "heavy")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("heavy").alias("n_heavy"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            "decile",
            "n_users",
            "n_heavy",
            _micros(
                F.col("n_heavy") * 1.0 / F.col("n_users") / F.col("base_rate")
            ).alias("lift_micros"),
        )
    )


# Corpus token entropy + effective vocabulary (exp H) — "how many
# tokens does this corpus really use": the one-number diversity
# summary next to q_zipf/q_heaps. p ln p terms over exact counts,
# nano-quantized before the sum; exp stays at the caller's edge
# (effective vocab reported as H itself plus the plain count).
@register(
    "q_token_entropy",
    f"""
    WITH uc AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
      GROUP BY tok
    ), tot AS (SELECT SUM(n) AS t, COUNT(*) AS v FROM uc)
    SELECT CAST(v AS BIGINT) AS vocab_size,
           CAST(t AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(-(n * 1.0 / t) * ln(n * 1.0 / t)
                * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS entropy_nanos_sum
    FROM uc CROSS JOIN tot
    GROUP BY t, v
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    uc = docs.select(
        F.explode(text_fns.tokens(F.col("text"))).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = uc.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("v"))
    p = F.col("n") * 1.0 / F.col("t")
    term = F.floor(-p * F.log(p) * 1_000_000_000 + 0.5).cast("long")
    return (
        uc.crossJoin(F.broadcast(tot))
        .groupBy("t", "v")
        .agg(F.sum(term).alias("entropy_nanos_sum"))
        .select(
            F.col("v").cast("long").alias("vocab_size"),
            F.col("t").cast("long").alias("n_tokens"),
            "entropy_nanos_sum",
        )
    )


# Where does a $200k order sit in each segment's distribution?
# Percentile-of-value WITHOUT any ranking: one conditional aggregate
# per group (count below / total) — the O(1)-extra-work dual of the
# quantile queries, exact longs, micros-quantized ratio.
@register(
    "q_value_percentile",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice < 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(FLOOR(SUM(CASE WHEN o_totalprice < 200000 THEN 1 ELSE 0 END)
                * 1.0 / COUNT(*) * 1000000 + 0.5) AS BIGINT)
             AS percentile_micros
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_value_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    below = F.sum(
        F.when(F.col("o_totalprice") < 200000, 1).otherwise(0)
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            below.alias("n_below"),
            _micros(below * 1.0 / F.count(F.lit(1))).alias(
                "percentile_micros"
            ),
        )
    )


# Calendar heatmap grid: (week index, day-of-week) event counts +
# micros revenue — the report.histogram feed for activity calendars.
# One map-side-combined groupBy on two derived integers.
@register(
    "q_calendar_heatmap",
    """
    WITH b AS (SELECT MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS w0
               FROM events)
    SELECT CAST(date_diff('day', w0, CAST(date_trunc('week', ts) AS TIMESTAMP))
                // 7 AS BIGINT) AS week_idx,
           CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_micros
    FROM events CROSS JOIN b
    GROUP BY 1, 2
    """,
)
def q_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    b = ev.agg(F.min(wk).alias("w0"))
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            F.expr(
                "CAST(datediff(date_trunc('week', ts), w0) DIV 7 AS BIGINT)"
            ).alias("week_idx"),
            (F.dayofweek(F.col("ts")) - 1).cast("long").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_micros(F.col("value"))).alias("value_micros"),
        )
    )


# Tukey-fence outlier share per segment: the boxplot rule (outside
# [q1 - 1.5 IQR, q3 + 1.5 IQR]) as a data-quality gate. Grouped
# quartiles in exact micros (percentile over integers interpolates
# bit-identically in both engines), fences in exact integer halves
# (x2 scaling avoids fractional micros), broadcast back onto one
# conditional aggregate per segment.
@register(
    "q_tukey_outliers",
    f"""
    WITH j AS (
      SELECT c_mktsegment AS g, {_MICROS_SQL.format(expr='o_totalprice')} AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), q AS (
      SELECT g,
             CAST(2 * quantile_cont(v, 0.25) AS BIGINT) AS q1_2,
             CAST(2 * quantile_cont(v, 0.75) AS BIGINT) AS q3_2
      FROM j GROUP BY g
    )
    SELECT g AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 2 * v < q1_2 - 3 * (q3_2 - q1_2) / 2
                          OR 2 * v > q3_2 + 3 * (q3_2 - q1_2) / 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM j JOIN q USING (g)
    GROUP BY g
    """,
)
def q_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(
        c, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("g"),
        _micros(F.col("o_totalprice")).alias("v"),
    )
    q = j.groupBy("g").agg(
        (2 * F.expr("percentile(v, 0.25)")).cast("long").alias("q1_2"),
        (2 * F.expr("percentile(v, 0.75)")).cast("long").alias("q3_2"),
    )
    iqr3_2 = 3 * (F.col("q3_2") - F.col("q1_2")) / 2
    is_out = (2 * F.col("v") < F.col("q1_2") - iqr3_2) | (
        2 * F.col("v") > F.col("q3_2") + iqr3_2
    )
    return (
        j.join(F.broadcast(q), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            F.col("g").alias("c_mktsegment"), "n", "n_outliers"
        )
    )


# Revenue time-concentration: how many of the busiest days carry 80%
# of all revenue (the "effective season length"). Daily sums ordered
# descending through the STAGED prefix sum; the answer is the first
# rank whose cumulative share clears 80% — an exact-integer filter
# (5*cum >= 4*total), one orderBy-limit over the tiny daily relation.
@register(
    "q_days_to_80pct",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT day, rev,
             SUM(rev) OVER (ORDER BY rev DESC, day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             SUM(rev) OVER () AS t,
             ROW_NUMBER() OVER (ORDER BY rev DESC, day) AS rn
      FROM daily
    )
    SELECT CAST(MIN(rn) AS BIGINT) AS days_to_80pct,
           CAST(MIN(t) AS BIGINT) AS total_micros,
           CAST(COUNT(*) AS BIGINT) AS qualifying_days
    FROM cum WHERE 5 * c >= 4 * t
    """,
)
def q_days_to_80pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    cum = grouped_prefix_sum(
        daily,
        [],
        [F.col("rev").desc(), F.col("day")],
        "rev",
        cum_col="c",
        total_col="t",
        stage=True,  # daily is shuffle-fed
    )
    ranked = grouped_rank(
        daily,
        [],
        [F.col("rev").desc(), F.col("day")],
        rank_col="rn",
        count_col="_n",
        stage=True,
    ).select("day", "rn")
    return (
        cum.join(ranked, "day")
        .filter(5 * F.col("c") >= 4 * F.col("t"))
        .agg(
            F.min("rn").cast("long").alias("days_to_80pct"),
            F.min("t").cast("long").alias("total_micros"),
            F.count(F.lit(1)).alias("qualifying_days"),
        )
    )


# ---------------------------------------------------------------------------
# Substring-level exact dedup (Lee et al. 2022 ExactSubstr semantics
# at fixed span granularity): every non-first occurrence of a
# corpus-wide repeated 8-token span is excised from its document.
# The Spark shape is the inverted-index ladder (dedup/substring.py);
# the oracle mirrors it span-for-span, rebuilding each document with
# a coverage anti-join + ordered string_agg.
# ---------------------------------------------------------------------------
@register(
    "q_substring_dedup",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, ' +'), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i+1:i+8], ' ')) AS h,
             doc_id * 1000000 + i AS okey
      FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ),
    canon AS (
      SELECT h, COUNT(*) AS c, MIN(okey) AS first_key
      FROM grams GROUP BY h HAVING COUNT(*) >= 2
    ),
    dups AS (
      SELECT g.doc_id, g.pos
      FROM grams g JOIN canon c USING (h)
      WHERE g.okey <> c.first_key
    ),
    tok_rows AS (
      SELECT doc_id, generate_subscripts(t, 1) - 1 AS i, unnest(t) AS tok
      FROM toks
    ),
    covered AS (
      SELECT DISTINCT r.doc_id, r.i
      FROM tok_rows r JOIN dups d
        ON d.doc_id = r.doc_id AND r.i BETWEEN d.pos AND d.pos + 7
    )
    SELECT r.doc_id,
           COUNT(*) AS n_tokens,
           CAST(COUNT(c.i) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN c.i IS NULL THEN r.tok END, ' ' ORDER BY r.i), '') AS clean_text
    FROM tok_rows r LEFT JOIN covered c ON c.doc_id = r.doc_id AND c.i = r.i
    GROUP BY r.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.dedup.substring import excise_repeated_ngrams

    docs = load_table(spark, sf_dir, "documents")
    return excise_repeated_ngrams(docs, "doc_id", "text", n=8, min_count=2)


# ---------------------------------------------------------------------------
# Conditional entropy of the event-transition process: H(next | cur)
# per current event type — how predictable the next step is (the
# information-theoretic refinement of q_transitions' raw matrix).
# Transition counts are one lead-window pass + one map-side-combined
# groupBy; entropy terms are nano-quantized per transition BEFORE the
# sum (the q_token_entropy idiom — partition-order float drift cannot
# reach the artifact).
# ---------------------------------------------------------------------------
@register(
    "q_cond_entropy",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), cnt AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (SELECT cur, SUM(n) AS t FROM cnt GROUP BY cur)
    SELECT c.cur,
           CAST(t.t AS BIGINT) AS n_trans,
           CAST(SUM(CAST(FLOOR(-(n * 1.0 / t.t) * ln(n * 1.0 / t.t)
                * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS entropy_nanos_sum
    FROM cnt c JOIN tot t ON c.cur = t.cur
    GROUP BY c.cur, t.t
    """,
)
def q_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("cur").agg(F.sum("n").alias("t"))
    p = F.col("n") * 1.0 / F.col("t")
    term = F.floor(-p * F.log(p) * 1_000_000_000 + 0.5).cast("long")
    # tot is one row per event type — schema-bounded broadcast
    return (
        cnt.join(F.broadcast(tot), "cur")
        .groupBy("cur", "t")
        .agg(F.sum(term).alias("entropy_nanos_sum"))
        .select(
            "cur",
            F.col("t").cast("long").alias("n_trans"),
            F.col("entropy_nanos_sum").cast("long").alias("entropy_nanos_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of daily event arrivals per type:
# var/mean of the observed-day counts — 1 for a Poisson process,
# larger = bursty traffic. Exact integer moments in DECIMAL(38)/
# HUGEINT, closed by the pure integer rounding division (the
# q_seasonal_adjust idiom — no float in the artifact at all).
# Defined over OBSERVED days (days with >= 1 event of the type).
# ---------------------------------------------------------------------------
@register(
    "q_burstiness",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, COUNT(*) AS d,
             SUM(CAST(c AS HUGEINT)) AS s1,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(d AS BIGINT) AS n_days,
           CAST(s1 AS BIGINT) AS n_events,
           CAST(((d * s2 - s1 * s1) * 1000000 + (d * s1) // 2)
                // (d * s1) AS BIGINT) AS fano_micros
    FROM m
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.col("c").cast(dec)).alias("s1"),
        F.sum(F.col("c").cast(dec) * F.col("c")).alias("s2"),
    )
    return m.select(
        "event_type",
        F.col("d").cast("long").alias("n_days"),
        F.col("s1").cast("long").alias("n_events"),
        F.expr(
            "CAST(((CAST(d AS DECIMAL(38,0)) * s2 - s1 * s1) * 1000000 "
            "+ (CAST(d AS DECIMAL(38,0)) * s1) DIV 2) "
            "DIV (CAST(d AS DECIMAL(38,0)) * s1) AS BIGINT)"
        ).alias("fano_micros"),
    )


# ---------------------------------------------------------------------------
# Order-of-magnitude histogram of order values: log-scale binning
# WITHOUT ln() — the bin is the digit count of the integer part
# (exact and portable; a power-of-ten boundary value can never flip
# bins on float rounding, the trap a floor(log10(x)) formulation
# carries). One map-side-combined groupBy on a derived integer.
# ---------------------------------------------------------------------------
@register(
    "q_hist_log",
    f"""
    SELECT LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)) AS digits,
           COUNT(*) AS n,
           CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
             AS sum_micros
    FROM orders
    GROUP BY 1
    """,
)
def q_hist_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digits = (
        F.length(F.floor(F.col("o_totalprice")).cast("long").cast("string"))
        .cast("long")
        .alias("digits")
    )
    return o.groupBy(digits).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("o_totalprice"))).alias("sum_micros"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: median of all pairwise slopes of the daily
# revenue series. The pair relation is bounded by the CALENDAR (d
# days -> d(d-1)/2 pairs), not by SF, so the inequality self-join and
# the global median rank never touch fact-scale data; the slope is
# one IEEE division of exact integer micros by exact day deltas
# (identical operands both engines -> bit-stable double).
# ---------------------------------------------------------------------------
@register(
    "q_theil_sen",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ), pairs AS (
      SELECT a.day AS da, b.day AS db,
             CAST(b.rev - a.rev AS DOUBLE)
               / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON b.day > a.day
    ), ranked AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope, da, db) AS rn,
             COUNT(*) OVER () AS np
      FROM pairs
    )
    SELECT (SELECT COUNT(*) FROM daily) AS n_days,
           CAST(np AS BIGINT) AS n_pairs,
           slope AS slope_micros_per_day
    FROM ranked WHERE rn = (np + 1) // 2
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    # Pair generation WITHOUT a nested-loop join: index the daily
    # series (window over the aggregated calendar-bounded relation),
    # explode each day j into its i < j predecessors in the scan
    # stage, and hash-join the broadcast day index back — ~3x faster
    # than the BroadcastNestedLoopJoin inequality join at the same
    # pair count.
    from pyspark.sql import Window

    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("j"),
        F.col("day").alias("db"),
        F.col("rev").alias("rb"),
    )
    lhs = idx.select(
        F.col("j").alias("i"), F.col("db").alias("da"), F.col("rb").alias("ra")
    )
    pairs = (
        idx.filter(F.col("j") >= 2)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.col("j") - 1)))
        .join(F.broadcast(lhs), "i")
        .select(
            "da",
            "db",
            (
                (F.col("rb") - F.col("ra")).cast("double")
                / F.datediff("db", "da").cast("double")
            ).alias("slope"),
        )
    )
    # the median rank over the d(d-1)/2 pairs rides the two-phase
    # distributed rank — even a calendar-bounded pair set is millions
    # of rows, and a partition-less window would sort them on ONE task
    ranked = grouped_rank(
        pairs, [], ["slope", "da", "db"], rank_col="rn", count_col="np"
    ).select("slope", "rn", "np")
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        ranked.filter(F.col("rn") == F.expr("(np + 1) DIV 2"))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("np").cast("long").alias("n_pairs"),
            F.col("slope").alias("slope_micros_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# Bollinger bands on daily revenue: 7-day trailing mean +/- 2 sigma,
# flagged entirely in EXACT integer arithmetic — the band test
# (x - s/n)^2 > 4 sigma^2 multiplies out to (n x - s)^2 > 4(n ss - s^2),
# so no division, no sqrt, no float ever enters the artifact. Whole
# currency units (micros DIV 1e6) keep every product far inside
# DECIMAL(38)/HUGEINT through sf1e6 daily sums. The trailing window
# runs over the calendar-bounded daily aggregate only.
# ---------------------------------------------------------------------------
@register(
    "q_bollinger",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               // 1000000 AS rev_units
      FROM orders GROUP BY 1
    ), w AS (
      SELECT day, rev_units,
             COUNT(*) OVER win AS n_win,
             SUM(CAST(rev_units AS HUGEINT)) OVER win AS s,
             SUM(CAST(rev_units AS HUGEINT) * rev_units) OVER win AS ss
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, rev_units,
           CAST(n_win AS BIGINT) AS n_win,
           (CAST(n_win AS HUGEINT) * rev_units - s < 0 AND
            (CAST(n_win AS HUGEINT) * rev_units - s)
              * (CAST(n_win AS HUGEINT) * rev_units - s)
              > 4 * (n_win * ss - s * s)) AS is_low,
           (CAST(n_win AS HUGEINT) * rev_units - s > 0 AND
            (CAST(n_win AS HUGEINT) * rev_units - s)
              * (CAST(n_win AS HUGEINT) * rev_units - s)
              > 4 * (n_win * ss - s * s)) AS is_high
    FROM w
    """,
)
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.expr(
            f"CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT) "
            "DIV 1000000"
        ).alias("rev_units")
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    dec = "decimal(38,0)"
    w = daily.select(
        "day",
        "rev_units",
        F.count(F.lit(1)).over(win).alias("n_win"),
        F.sum(F.col("rev_units").cast(dec)).over(win).alias("s"),
        F.sum(F.col("rev_units").cast(dec) * F.col("rev_units")).over(win).alias("ss"),
    )
    dev = F.col("n_win").cast(dec) * F.col("rev_units") - F.col("s")
    band = 4 * (F.col("n_win").cast(dec) * F.col("ss") - F.col("s") * F.col("s"))
    return w.select(
        "day",
        "rev_units",
        F.col("n_win").cast("long").alias("n_win"),
        ((dev < 0) & (dev * dev > band)).alias("is_low"),
        ((dev > 0) & (dev * dev > band)).alias("is_high"),
    )


# ---------------------------------------------------------------------------
# Per-document keyword extraction: top-3 terms by tf x idf where idf
# is micros-quantized ONCE per term in the vocabulary relation
# (floor(ln(N/df) * 1e6 + 0.5)) — the score tf * idf_micros is then
# an exact integer, so the per-doc ranking is bit-stable across
# engines. Differs from q_tfidf (top-1 by raw (tf, df) order): this
# is the scored extraction a search/indexing pipeline ships.
# ---------------------------------------------------------------------------
@register(
    "q_doc_keywords",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
      WHERE term <> '' GROUP BY term
    ), n AS (SELECT COUNT(*) AS nd FROM documents),
    idf AS (
      SELECT term, df,
             CAST(FLOOR(ln(nd * 1.0 / df) * 1000000 + 0.5) AS BIGINT)
               AS idf_micros
      FROM df CROSS JOIN n
    )
    SELECT doc_id, term, CAST(score AS BIGINT) AS score,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT tf.doc_id, tf.term, tf.tf * idf.idf_micros AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * idf.idf_micros DESC,
                                         tf.term) AS rk
      FROM tf JOIN idf USING (term)
    ) WHERE rk <= 3
    """,
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(text_fns.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    idf = df_.crossJoin(F.broadcast(nd)).select(
        "term",
        F.floor(F.log(F.col("nd") * 1.0 / F.col("df")) * 1_000_000 + 0.5)
        .cast("long")
        .alias("idf_micros"),
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf_micros")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", F.col("score").cast("long").alias("score"), "rk")
    )


# ---------------------------------------------------------------------------
# Rank movers: customers whose revenue RANK changed most between 1995
# and 1996 — the leaderboard-delta analysis. Per-year ranks ride the
# two-phase distributed rank (never a single-task global window over
# per-customer rollups); the yearly relations then equi-join on
# customer and the top movers come off a TakeOrdered (orderBy+limit),
# which is a per-partition top-k + driver merge, not a global sort.
# ---------------------------------------------------------------------------
@register(
    "q_topk_movers",
    f"""
    WITH yearly AS (
      SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT o_custkey, yr,
             ROW_NUMBER() OVER (PARTITION BY yr
                                ORDER BY rev DESC, o_custkey) AS rn
      FROM yearly
    )
    SELECT a.o_custkey AS c_custkey,
           CAST(a.rn AS BIGINT) AS rank_1995,
           CAST(b.rn AS BIGINT) AS rank_1996,
           CAST(a.rn - b.rn AS BIGINT) AS rank_delta
    FROM ranked a JOIN ranked b ON a.o_custkey = b.o_custkey
    WHERE a.yr = 1995 AND b.yr = 1996
    ORDER BY ABS(a.rn - b.rn) DESC, a.o_custkey
    LIMIT 10
    """,
)
def q_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    yearly = (
        o.withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1995, 1996))
        .groupBy("o_custkey", "yr")
        .agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    )
    ranked = grouped_rank(
        yearly, ["yr"], [F.col("rev").desc(), F.col("o_custkey")], rank_col="rn"
    ).select("o_custkey", "yr", "rn")
    a = ranked.filter(F.col("yr") == 1995).select(
        F.col("o_custkey").alias("c_custkey"), F.col("rn").alias("rank_1995")
    )
    b = ranked.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("c_custkey"), F.col("rn").alias("rank_1996")
    )
    return (
        a.join(b, "c_custkey")
        .select(
            "c_custkey",
            "rank_1995",
            "rank_1996",
            (F.col("rank_1995") - F.col("rank_1996")).alias("rank_delta"),
        )
        .orderBy(F.abs(F.col("rank_delta")).desc(), "c_custkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Grouped skewness (Fisher g1) of order values per segment: third
# standardized moment from ONE fused aggregate of exact cents
# moments (n, sum x, sum x^2, sum x^3 in DECIMAL(38)/HUGEINT —
# cents keep sum(x^3) inside 38 digits through sf100). The closing
# g1 = (n^2 m3) / (n m2)^1.5 combination runs in DOUBLE over the
# exact integer aggregates with an identical expression tree on both
# engines, micros-quantized at the end.
# ---------------------------------------------------------------------------
@register(
    "q_group_skewness",
    """
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS s1,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s2,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s3
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
              - 3.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
              + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / CAST(n AS DOUBLE)
             / pow(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 1.5)
             * 1000000 + 0.5) AS BIGINT) AS skew_micros
    FROM m
    """,
)
def q_group_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    dec = "decimal(38,0)"
    m = (
        join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", cents.alias("x"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(dec)).alias("s1"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("s2"),
            F.sum(F.col("x").cast(dec) * F.col("x") * F.col("x")).alias("s3"),
        )
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    num = (
        d("n") * d("n") * d("s3")
        - 3.0 * d("n") * d("s1") * d("s2")
        + 2.0 * d("s1") * d("s1") * d("s1")
    )
    g1 = num / d("n") / F.pow(d("n") * d("s2") - d("s1") * d("s1"), 1.5)
    return m.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.floor(g1 * 1_000_000 + 0.5).cast("long").alias("skew_micros"),
    )


# ---------------------------------------------------------------------------
# Source drift vs the corpus: KL(p_source || p_corpus) over unigram
# distributions — the mixture-quality diagnostic a corpus curator
# watches per ingest source. All counts exact; each term's
# p_s * ln(p_s / p_c) contribution is nano-quantized BEFORE the sum
# (per-term quantization: partition-order float drift cannot reach
# the artifact), and the source totals join back onto the
# vocabulary-sized relation.
# ---------------------------------------------------------------------------
@register(
    "q_kl_source",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS_SQL}) AS term FROM documents
    ), st AS (
      SELECT source, term, COUNT(*) AS n FROM tok
      WHERE term <> '' GROUP BY source, term
    ), ct AS (
      SELECT term, SUM(n) AS ct FROM st GROUP BY term
    ), stot AS (
      SELECT source, SUM(n) AS ns FROM st GROUP BY source
    ), tot AS (SELECT SUM(n) AS nc FROM st)
    SELECT st.source,
           CAST(stot.ns AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(
             (st.n * 1.0 / stot.ns)
             * ln((st.n * 1.0 / stot.ns) / (ct.ct * 1.0 / tot.nc))
             * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS kl_nanos_sum
    FROM st
    JOIN ct USING (term)
    JOIN stot USING (source)
    CROSS JOIN tot
    GROUP BY st.source, stot.ns
    """,
)
def q_kl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(text_fns.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    ct = st.groupBy("term").agg(F.sum("n").alias("ct"))
    stot = st.groupBy("source").agg(F.sum("n").alias("ns"))
    tot = st.agg(F.sum("n").alias("nc"))
    ps = F.col("n") * 1.0 / F.col("ns")
    pc = F.col("ct") * 1.0 / F.col("nc")
    term = F.floor(ps * F.log(ps / pc) * 1_000_000_000 + 0.5).cast("long")
    # ct joins on the vocabulary relation (un-hinted, AQE-sized);
    # stot/tot are per-source / 1-row aggregates — bounded broadcasts
    return (
        st.join(ct, "term")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "ns")
        .agg(F.sum(term).alias("kl_nanos_sum"))
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens"),
            F.col("kl_nanos_sum").cast("long").alias("kl_nanos_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across ALL market segments (the k-group
# generalization of q_mann_whitney): doubled midranks come from the
# per-distinct-value counts via the two-phase prefix sum — no per-row
# global ranking anywhere — and every rank sum, the H numerator terms
# (R2_g^2 DIV 4n_g, exact integer division: deterministic on both
# engines) and the tie-correction sum are exact DECIMAL(38)/HUGEINT
# integers. Only the final H / tie-corrected H close in double,
# micros-quantized. Headroom: R2_g^2 stays inside 38 digits through
# ~sf1000 row counts.
# ---------------------------------------------------------------------------
@register(
    "q_kruskal_wallis",
    f"""
    WITH seg AS (
      SELECT c_mktsegment AS g, {_MICROS_SQL.format(expr='o_totalprice')} AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), gv AS (
      SELECT g, v, COUNT(*) AS cgv FROM seg GROUP BY g, v
    ), vals AS (
      SELECT v, SUM(cgv) AS cnt FROM gv GROUP BY v
    ), cum AS (
      SELECT v, cnt, SUM(cnt) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM vals
    ), mr AS (
      SELECT v, 2 * (c - cnt) + cnt + 1 AS mr2 FROM cum
    ), rg AS (
      SELECT g, SUM(CAST(cgv AS HUGEINT) * mr2) AS r2,
             SUM(CAST(cgv AS HUGEINT)) AS ng
      FROM gv JOIN mr USING (v) GROUP BY g
    ), terms AS (
      SELECT SUM((r2 * r2) // (4 * ng)) AS s,
             SUM(ng) AS n, COUNT(*) AS k
      FROM rg
    ), ties AS (
      SELECT SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tsum FROM vals
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(FLOOR(
             (12.0 * CAST(s AS DOUBLE)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              - 3.0 * (CAST(n AS DOUBLE) + 1.0)) * 1000000 + 0.5) AS BIGINT)
             AS h_micros,
           CAST(FLOOR(
             (12.0 * CAST(s AS DOUBLE)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(tsum AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE)))
             * 1000000 + 0.5) AS BIGINT) AS h_tie_micros
    FROM terms CROSS JOIN ties
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.ranking import grouped_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dec = "decimal(38,0)"
    seg = join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("g"),
        _micros(F.col("o_totalprice")).alias("v"),
    )
    gv = seg.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cgv"))
    vals = gv.groupBy("v").agg(F.sum("cgv").alias("cnt"))
    # vals is shuffle-fed; grouped_prefix_sum auto-stages (ranking.py)
    cum = grouped_prefix_sum(vals, [], ["v"], "cnt", cum_col="c")
    mr = cum.select(
        "v", (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1).alias("mr2")
    )
    rg = (
        gv.join(mr, "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("cgv").cast(dec) * F.col("mr2")).alias("r2"),
            F.sum(F.col("cgv").cast(dec)).alias("ng"),
        )
    )
    terms = rg.agg(
        F.sum(F.expr("(r2 * r2) DIV (4 * ng)")).alias("s"),
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
    )
    ties = vals.agg(
        F.sum(
            F.col("cnt").cast(dec) * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tsum")
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    h = (
        12.0 * d("s") / (d("n") * (d("n") + 1.0))
        - 3.0 * (d("n") + 1.0)
    )
    tie_c = 1.0 - d("tsum") / (d("n") * d("n") * d("n") - d("n"))
    return terms.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.floor(h * 1_000_000 + 0.5).cast("long").alias("h_micros"),
        F.floor(h / tie_c * 1_000_000 + 0.5).cast("long").alias("h_tie_micros"),
    )


# ---------------------------------------------------------------------------
# ANN quality metric: Mean Reciprocal Rank of the bucketed LSH path
# against the exact nearest neighbor — the retrieval-eval companion
# to q_embed_lsh_recall (recall measures the pair SET; MRR measures
# where the true neighbor LANDS in the ranked list). BOTH sides are
# modeled in the oracle (exact top-1 as the brute-force join, LSH
# top-10 via the deterministic-plane reproduction), and the
# reciprocal ranks are exact integers (1e6 DIV rank), so the metric
# VALUE is driver-checkable, not just pinned.
# ---------------------------------------------------------------------------
_ANN_MRR_ORACLE = f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    bf_dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT query_id, neighbor_id AS true_nn FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                 neighbor_id) AS rn
        FROM bf_dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON neighbor_id = nc.vec_id
      ) WHERE rn = 1
    ),
    planes(p, i, c) AS (VALUES {{planes}}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    buckets AS (
      SELECT vec_id, string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    lsh_dots AS (
      SELECT query_id, neighbor_id, SUM(a.e * b.e) AS dot
      FROM pairs
      JOIN fixed a ON a.vec_id = query_id
      JOIN fixed b ON b.vec_id = neighbor_id AND b.i = a.i
      GROUP BY query_id, neighbor_id
    ),
    lsh AS (
      SELECT query_id, neighbor_id, rn AS rank FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                 neighbor_id) AS rn
        FROM lsh_dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON neighbor_id = nc.vec_id
      ) WHERE rn <= 10
    ),
    rr AS (
      SELECT e.query_id,
             COALESCE(MAX(CASE WHEN l.neighbor_id = e.true_nn
                                THEN 1000000 // l.rank END), 0) AS rrm
      FROM exact e LEFT JOIN lsh l ON l.query_id = e.query_id
      GROUP BY e.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN rrm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST((SUM(rrm) + COUNT(*) // 2) // COUNT(*) AS BIGINT) AS mrr_micros
    FROM rr
"""


@register("q_ann_mrr", _ANN_MRR_ORACLE.format(planes=_ANN_PLANES_VALUES))
def q_ann_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact1 = ann_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=1).select(
        "query_id", F.col("neighbor_id").alias("true_nn")
    )
    lsh10 = ann_ops.lsh_topk(
        emb, q, "vec_id", "embedding", k=10, num_planes=4
    ).select("query_id", "neighbor_id", "rank")
    rr = (
        exact1.join(lsh10, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("neighbor_id") == F.col("true_nn"),
                        F.expr("1000000 DIV rank"),
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("rrm")
        )
    )
    return rr.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("rrm") > 0, 1).otherwise(0)).cast("long").alias("n_hits"),
        F.expr(
            "CAST((SUM(rrm) + COUNT(*) DIV 2) DIV COUNT(*) AS BIGINT)"
        ).alias("mrr_micros"),
    )


# ---------------------------------------------------------------------------
# Rolling correlation between daily revenue and daily order count
# (28-day trailing window): is growth volume-driven or ticket-size-
# driven, day by day? The window runs over the calendar-bounded daily
# aggregate only; moments accumulate exactly (units x counts in
# DECIMAL(38)/HUGEINT) and close in one double expression with
# nullif guards for zero-variance windows (ANSI mode raises on /0).
# ---------------------------------------------------------------------------
@register(
    "q_rolling_corr",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               // 1000000 AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1
    ), w AS (
      SELECT day, x, y,
             COUNT(*) OVER win AS n,
             SUM(CAST(x AS HUGEINT)) OVER win AS sx,
             SUM(CAST(y AS HUGEINT)) OVER win AS sy,
             SUM(CAST(x AS HUGEINT) * x) OVER win AS sxx,
             SUM(CAST(y AS HUGEINT) * y) OVER win AS syy,
             SUM(CAST(x AS HUGEINT) * y) OVER win AS sxy
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(n AS BIGINT) AS n_win,
           CAST(FLOOR(
             CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)), 0.0)
             / nullif(sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
             * 1000000 + 0.5) AS BIGINT) AS corr_micros
    FROM w
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.expr(
            f"CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT) "
            "DIV 1000000"
        ).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    win = Window.orderBy("day").rowsBetween(-27, 0)
    dec = "decimal(38,0)"
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum(F.col("x").cast(dec)).over(win).alias("sx"),
        F.sum(F.col("y").cast(dec)).over(win).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(win).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).over(win).alias("sxy"),
    )
    nd = F.col("n").cast(dec)
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    vy = F.sqrt((nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return w.select(
        "day",
        F.col("n").cast("long").alias("n_win"),
        F.floor(
            num / F.nullif(vx, F.lit(0.0)) / F.nullif(vy, F.lit(0.0)) * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("corr_micros"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty per document: what fraction of a doc's 8-token
# spans exists NOWHERE else in the corpus? The inverse diagnostic of
# q_substring_dedup's excision (and the per-doc refinement of
# q_boilerplate's corpus score) — a curator sorts ascending to find
# templated/boilerplate docs. Same span-hash inverted index, one
# map-side-combined shuffle; docs shorter than 8 tokens report NULL
# novelty (no spans to judge).
# ---------------------------------------------------------------------------
@register(
    "q_gram_novelty",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, ' +'), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, md5(array_to_string(t[i+1:i+8], ' ')) AS h
      FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ),
    freq AS (SELECT h, COUNT(*) AS c FROM grams GROUP BY h),
    per_doc AS (
      SELECT g.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN f.c = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM grams g JOIN freq f USING (h)
      GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_unique, 0) AS BIGINT) AS n_unique,
           CAST(FLOOR(p.n_unique * 1.0 / p.n_grams * 1000000 + 0.5) AS BIGINT)
             AS novelty_micros
    FROM toks t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    """,
)
def q_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.expr("filter(split(text, ' +'), x -> x != '')").alias("_toks"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 8 THEN "
                "transform(sequence(0, size(_toks) - 8), "
                "i -> md5(concat_ws(' ', slice(_toks, i + 1, 8)))) "
                "ELSE array() END"
            )
        ).alias("h"),
    )
    freq = grams.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        grams.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
        F.floor(
            F.col("n_unique") * 1.0 / F.col("n_grams") * 1_000_000 + 0.5
        )
        .cast("long")
        .alias("novelty_micros"),
    )


# ---------------------------------------------------------------------------
# Embedding norm profile per label: mean / spread of L2 norms — the
# first sanity check on an embedding table (un-normalized vectors,
# collapsed clusters and scale drift between labels all show up
# here). Norms are micros-quantized per ROW from the exact
# fixed-point squared norm (identical integer operand -> identical
# sqrt double on both engines), then the per-label moments are exact
# integers closed by rounding division / one sqrt.
# ---------------------------------------------------------------------------
@register(
    "q_embed_norm_stats",
    """
    WITH n2s AS (
      SELECT label,
             (SELECT SUM(e * e) FROM (
                SELECT CAST(FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS e
                FROM unnest(embedding) AS u(x)
              )) AS n2
      FROM embeddings
    ), norms AS (
      SELECT label,
             CAST(FLOOR(sqrt(CAST(n2 AS DOUBLE)) / 1048576 * 1000000 + 0.5)
                  AS BIGINT) AS nm
      FROM n2s
    ), m AS (
      SELECT label, COUNT(*) AS n,
             SUM(CAST(nm AS HUGEINT)) AS s1,
             SUM(CAST(nm AS HUGEINT) * nm) AS s2
      FROM norms GROUP BY label
    )
    SELECT label, CAST(n AS BIGINT) AS n,
           CAST((s1 + n // 2) // n AS BIGINT) AS mean_norm_micros,
           CAST(FLOOR(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                      / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
             AS std_norm_micros
    FROM m
    """,
)
def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = core_ops.spread(load_table(spark, sf_dir, "embeddings"))
    n2 = F.expr(
        "aggregate(transform(embedding, "
        "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, e) -> acc + e * e)"
    )
    nm = F.floor(
        F.sqrt(n2.cast("double")) / 1048576 * 1_000_000 + 0.5
    ).cast("long")
    dec = "decimal(38,0)"
    m = emb.select("label", nm.alias("nm")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("nm").cast(dec)).alias("s1"),
        F.sum(F.col("nm").cast(dec) * F.col("nm")).alias("s2"),
    )
    return m.select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.expr(
            "CAST((s1 + CAST(n AS DECIMAL(38,0)) DIV 2) "
            "DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("mean_norm_micros"),
        F.floor(
            F.sqrt(
                (
                    F.col("n").cast(dec) * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
            )
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("long")
        .alias("std_norm_micros"),
    )


# ---------------------------------------------------------------------------
# ROC AUC of account balance as a churn predictor (churn = customer
# with orders before 1997 but none after): AUC is exactly the
# Mann-Whitney U statistic normalized by n1*n0, so it reuses the
# doubled-midrank machinery — per-distinct-value counts, two-phase
# prefix sum, EXACT integer rank sums — and closes with one pure
# integer rounding division. No sort of the fact table, no float
# until nothing is left to compute.
# ---------------------------------------------------------------------------
@register(
    "q_auc",
    """
    WITH lab AS (
      SELECT c.c_custkey,
             CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN MAX(o.o_orderdate) < TIMESTAMP '1997-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS churned
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), vals AS (
      SELECT v, COUNT(*) AS cnt, SUM(churned) AS cnt_p
      FROM lab GROUP BY v
    ), cum AS (
      SELECT v, cnt, cnt_p,
             SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM vals
    ), tots AS (
      SELECT CAST(SUM(cnt_p) AS BIGINT) AS n1,
             CAST(SUM(cnt) - SUM(cnt_p) AS BIGINT) AS n0
      FROM vals
    ), r AS (
      SELECT CAST(SUM(cnt_p * (2 * (c - cnt) + cnt + 1)) AS BIGINT) AS r2_p
      FROM cum
    )
    SELECT n1 AS n_churned, n0 AS n_retained,
           CAST(((r2_p - n1 * (n1 + 1)) * 1000000 + (2 * n1 * n0) // 2)
                // (2 * n1 * n0) AS BIGINT) AS auc_micros
    FROM r CROSS JOIN tots
    """,
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.ranking import grouped_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lab = (
        join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("v"),
        )
        .agg(
            F.when(
                F.max("o_orderdate") < F.lit("1997-01-01").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("churned")
        )
    )
    vals = lab.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("churned").alias("cnt_p")
    )
    cum = grouped_prefix_sum(vals, [], ["v"], "cnt", cum_col="c")
    tots = vals.agg(
        F.sum("cnt_p").alias("n1"),
        (F.sum("cnt") - F.sum("cnt_p")).alias("n0"),
    )
    r = cum.agg(
        F.sum(
            F.col("cnt_p") * (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("r2_p")
    )
    return r.crossJoin(F.broadcast(tots)).select(
        F.col("n1").cast("long").alias("n_churned"),
        F.col("n0").cast("long").alias("n_retained"),
        F.expr(
            "CAST(((r2_p - n1 * (n1 + 1)) * 1000000 + (2 * n1 * n0) DIV 2) "
            "DIV (2 * n1 * n0) AS BIGINT)"
        ).alias("auc_micros"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on daily revenue — the significance
# companion to q_theil_sen's slope estimate: S = sum of pairwise
# sign comparisons (EXACT integer via the same explode-join pair
# generation, no nested loop), tie-corrected variance exact, one
# final z expression in double. The pair set is calendar-bounded.
# ---------------------------------------------------------------------------
@register(
    "q_mann_kendall",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ), s AS (
      SELECT SUM(CASE WHEN b.rev > a.rev THEN 1
                      WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS s,
             COUNT(*) AS np
      FROM daily a JOIN daily b ON b.day > a.day
    ), n AS (SELECT COUNT(*) AS nd FROM daily),
    ties AS (
      SELECT COALESCE(SUM(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)), 0) AS tsum
      FROM (SELECT rev, COUNT(*) AS c FROM daily GROUP BY rev HAVING COUNT(*) > 1)
    )
    SELECT CAST(nd AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS s,
           CAST(FLOOR(
             (CAST(s AS DOUBLE) - CASE WHEN s > 0 THEN 1.0
                                       WHEN s < 0 THEN -1.0 ELSE 0.0 END)
             / sqrt((CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1.0)
                     * (2.0 * CAST(nd AS DOUBLE) + 5.0)
                     - CAST(tsum AS DOUBLE)) / 18.0)
             * 1000000 + 0.5) AS BIGINT) AS z_micros
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("j"),
        F.col("rev").alias("rb"),
    )
    lhs = idx.select(F.col("j").alias("i"), F.col("rb").alias("ra"))
    sgn = (
        idx.filter(F.col("j") >= 2)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.col("j") - 1)))
        .join(F.broadcast(lhs), "i")
        .agg(
            F.sum(
                F.when(F.col("rb") > F.col("ra"), 1)
                .when(F.col("rb") < F.col("ra"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("np"),
        )
    )
    nd = daily.agg(F.count(F.lit(1)).alias("nd"))
    dec = "decimal(38,0)"
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c").cast(dec) * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0).cast(dec),
            ).alias("tsum")
        )
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    z = (
        d("s")
        - F.when(F.col("s") > 0, 1.0).when(F.col("s") < 0, -1.0).otherwise(0.0)
    ) / F.sqrt(
        (d("nd") * (d("nd") - 1.0) * (2.0 * d("nd") + 5.0) - d("tsum")) / 18.0
    )
    return (
        sgn.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("nd").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s"),
            F.floor(z * 1_000_000 + 0.5).cast("long").alias("z_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Pettitt changepoint test on daily revenue (the rank-based
# complement to q_cusum_changepoint's mean-shift scan): with doubled
# midranks mr2, U_t = sum_{i<=t} mr2_i - t(n+1) is EXACT integer for
# every prefix t, K = max |U_t| picks the split, and only the
# approximate significance p ~ 2 exp(-6K^2/(n^3+n^2)) closes in
# double. Midranks come from the value-table prefix sum; the U_t
# series is a second prefix sum over the calendar-bounded day order.
# ---------------------------------------------------------------------------
@register(
    "q_pettitt",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ), vals AS (
      SELECT rev, COUNT(*) AS cnt FROM daily GROUP BY rev
    ), cumv AS (
      SELECT rev, cnt, SUM(cnt) OVER (ORDER BY rev
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM vals
    ), mr AS (
      SELECT rev, 2 * (c - cnt) + cnt + 1 AS mr2 FROM cumv
    ), seq AS (
      SELECT d.day,
             ROW_NUMBER() OVER (ORDER BY d.day) AS t,
             SUM(mr.mr2) OVER (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS smr2,
             COUNT(*) OVER () AS n
      FROM daily d JOIN mr ON d.rev = mr.rev
    ), u AS (
      SELECT day, t, smr2 - t * (n + 1) AS u2, n FROM seq WHERE t < n
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(ABS(u2) AS BIGINT) AS k2_stat,
           day AS changepoint_day,
           CAST(FLOOR(
             2.0 * exp(-6.0 * (CAST(u2 AS DOUBLE) / 2.0)
                       * (CAST(u2 AS DOUBLE) / 2.0)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             * 1000000 + 0.5) AS BIGINT) AS p_micros
    FROM u
    ORDER BY ABS(u2) DESC, day
    LIMIT 1
    """,
)
def q_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from frames_spark.operators.ranking import grouped_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_micros(F.col("o_totalprice"))).alias("rev"))
    vals = daily.groupBy("rev").agg(F.count(F.lit(1)).alias("cnt"))
    cumv = grouped_prefix_sum(vals, [], ["rev"], "cnt", cum_col="c")
    mr = cumv.select(
        "rev", (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1).alias("mr2")
    )
    # the day sequence is calendar-bounded: plain windows over the
    # joined daily relation (aggregate upstream exempts the advisor)
    wday = Window.orderBy("day")
    seq = (
        daily.join(mr, "rev")
        .select(
            "day",
            F.row_number().over(wday).alias("t"),
            F.sum("mr2")
            .over(wday.rowsBetween(Window.unboundedPreceding, 0))
            .alias("smr2"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
    )
    u = seq.filter(F.col("t") < F.col("n")).select(
        "day",
        (F.col("smr2") - F.col("t") * (F.col("n") + 1)).alias("u2"),
        "n",
    )
    uh = F.col("u2").cast("double") / 2.0
    nn = F.col("n").cast("double")
    p = 2.0 * F.exp(-6.0 * uh * uh / (nn * nn * nn + nn * nn))
    return (
        u.select(
            F.col("n").cast("long").alias("n_days"),
            F.abs(F.col("u2")).cast("long").alias("k2_stat"),
            F.col("day").alias("changepoint_day"),
            F.floor(p * 1_000_000 + 0.5).cast("long").alias("p_micros"),
        )
        .orderBy(F.desc("k2_stat"), "changepoint_day")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Deterministic k-per-group sampling: 10 docs per source by md5 hash
# order — the reproducible "eyeball sample" every corpus review
# starts with (and the per-stratum variant of q_sample_hash). The
# per-source ranks ride the two-phase distributed rank, never a
# fact-scale PARTITION BY window, and the hash order makes the
# sample invariant to file layout and ingestion order.
# ---------------------------------------------------------------------------
@register(
    "q_sample_per_source",
    """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def q_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ranked = grouped_rank(
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("_h"),
        ),
        ["source"],
        ["_h", "doc_id"],
        rank_col="rn",
    )
    return ranked.filter(F.col("rn") <= 10).select("source", "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# Token coverage curve point: how many vocabulary entries cover 90%
# of all token occurrences? The tokenizer-budget question (same
# staged two-phase rank + prefix-sum machinery as q_days_to_80pct,
# over the vocabulary relation in frequency order) with an exact
# integer 90% gate — no float thresholds.
# ---------------------------------------------------------------------------
@register(
    "q_token_coverage",
    f"""
    WITH uc AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
      WHERE tok <> '' GROUP BY tok
    ), ranked AS (
      SELECT n,
             ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rn,
             SUM(n) OVER (ORDER BY n DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n) OVER () AS total,
             COUNT(*) OVER () AS vocab
      FROM uc
    )
    SELECT CAST(MIN(rn) AS BIGINT) AS vocab_90pct,
           CAST(MIN(vocab) AS BIGINT) AS vocab_size,
           CAST(MIN(total) AS BIGINT) AS n_tokens
    FROM ranked WHERE 10 * cum >= 9 * total
    """,
)
def q_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.ranking import grouped_prefix_sum

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    uc = (
        docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # one staged partitioning serves BOTH the rank and the running
    # sum (vocab relation is shuffle-fed: auto-staged)
    cum = grouped_prefix_sum(
        uc, [], [F.col("n").desc(), "tok"], "n",
        cum_col="cum", total_col="total",
    )
    ranked = grouped_rank(
        cum, [], [F.col("n").desc(), "tok"], rank_col="rn", count_col="vocab"
    )
    return ranked.filter(10 * F.col("cum") >= 9 * F.col("total")).agg(
        F.min("rn").cast("long").alias("vocab_90pct"),
        F.min("vocab").cast("long").alias("vocab_size"),
        F.min("total").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent of daily revenue (rescaled-range analysis): is the
# series mean-reverting (H < 0.5), random-walk (0.5) or trending
# (H > 0.5)? For block sizes w in {8,16,32,64,128}, each block's
# R/S collapses to R_scaled / sqrt(D) where BOTH operands are exact
# integers (R_scaled = range of w*cumsum_t - t*blocksum, D = w*sum
# x^2 - (sum x)^2) — so every block's ratio is one deterministic
# double op; block ratios are micros-quantized, averaged with
# integer rounding division per w, and the final log-log OLS slope
# runs over 5 nano-quantized points. Whole-unit values keep all
# products inside DECIMAL(38)/HUGEINT through sf1000. Constant
# blocks (D = 0) are excluded identically on both engines.
# ---------------------------------------------------------------------------
@register(
    "q_hurst",
    f"""
    WITH daily AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT)
                 // 1000000 AS x
        FROM orders GROUP BY 1
      )
    ), sizes(w) AS (VALUES (8),(16),(32),(64),(128)),
    blocks AS (
      SELECT w, (t - 1) // w AS blk, (t - 1) % w + 1 AS i, x
      FROM daily CROSS JOIN sizes
      WHERE (t - 1) // w < (SELECT COUNT(*) FROM daily) // w
    ), bs AS (
      SELECT w, blk,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM blocks GROUP BY w, blk
    ), z AS (
      SELECT b.w, b.blk,
             b.w * SUM(CAST(b.x AS HUGEINT)) OVER (PARTITION BY b.w, b.blk
               ORDER BY b.i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - b.i * bs.sx AS wz
      FROM blocks b JOIN bs ON b.w = bs.w AND b.blk = bs.blk
    ), rs AS (
      SELECT z.w, z.blk,
             CAST(FLOOR(
               CAST(MAX(z.wz) - MIN(z.wz) AS DOUBLE)
               / sqrt(CAST(bs.w * bs.sxx - bs.sx * bs.sx AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS rs_micros
      FROM z JOIN bs ON z.w = bs.w AND z.blk = bs.blk
      WHERE bs.w * bs.sxx - bs.sx * bs.sx > 0
      GROUP BY z.w, z.blk, bs.w, bs.sxx, bs.sx
    ), pts AS (
      SELECT w,
             CAST((SUM(CAST(rs_micros AS HUGEINT)) + COUNT(*) // 2)
                  // COUNT(*) AS BIGINT) AS avg_rs_micros
      FROM rs GROUP BY w
    ), terms AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(FLOOR(ln(w) * 1000000000 + 0.5) AS BIGINT)) AS sx,
             SUM(CAST(FLOOR(ln(avg_rs_micros / 1000000.0) * 1000000000 + 0.5) AS BIGINT)) AS sy,
             SUM(CAST(FLOOR(ln(w) * ln(w) * 1000000000 + 0.5) AS BIGINT)) AS sxx,
             SUM(CAST(FLOOR(ln(w) * ln(avg_rs_micros / 1000000.0) * 1000000000 + 0.5) AS BIGINT)) AS sxy
      FROM pts
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(k AS BIGINT) AS n_scales,
           CAST(FLOOR(
             (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1000000000.0)
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1000000000.0)
             * 1000000 + 0.5) AS BIGINT) AS hurst_micros
    FROM terms
    """,
)
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    daily = (
        o.groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"))
        .agg(
            F.expr(
                f"CAST(SUM({_MICROS_SQL.format(expr='o_totalprice')}) AS BIGINT) "
                "DIV 1000000"
            ).alias("x")
        )
        .select(F.row_number().over(Window.orderBy("day")).alias("t"), "x")
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    sizes = daily.sparkSession.createDataFrame([(w,) for w in (8, 16, 32, 64, 128)], "w int")
    blocks = (
        daily.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(nd))
        .filter(F.expr("(t - 1) DIV w < n_days DIV w"))
        .select(
            "w",
            F.expr("(t - 1) DIV w").alias("blk"),
            F.expr("(t - 1) % w + 1").alias("i"),
            "x",
        )
    )
    bs = blocks.groupBy("w", "blk").agg(
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
    )
    wcum = (
        Window.partitionBy("w", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    z = (
        blocks.withColumn("_cum", F.sum(F.col("x").cast(dec)).over(wcum))
        .join(bs, ["w", "blk"])
        .select(
            "w",
            "blk",
            "sx",
            "sxx",
            (F.col("w").cast(dec) * F.col("_cum") - F.col("i") * F.col("sx")).alias("wz"),
        )
    )
    d_var = F.col("w").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")
    rs = (
        z.groupBy("w", "blk", "sx", "sxx")
        .agg(F.max("wz").alias("mx"), F.min("wz").alias("mn"))
        .filter(d_var > 0)
        .select(
            "w",
            F.floor(
                (F.col("mx") - F.col("mn")).cast("double")
                / F.sqrt(d_var.cast("double"))
                * 1_000_000
                + 0.5
            )
            .cast("long")
            .alias("rs_micros"),
        )
    )
    pts = rs.groupBy("w").agg(
        F.expr(
            "CAST((SUM(CAST(rs_micros AS DECIMAL(38,0))) + COUNT(*) DIV 2) "
            "DIV COUNT(*) AS BIGINT)"
        ).alias("avg_rs_micros")
    )
    lw = F.log(F.col("w").cast("double"))
    ly = F.log(F.col("avg_rs_micros") / 1_000_000.0)
    q = lambda c: F.floor(c * 1_000_000_000 + 0.5).cast("long")  # noqa: E731
    terms = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(q(lw)).alias("sx"),
        F.sum(q(ly)).alias("sy"),
        F.sum(q(lw * lw)).alias("sxx"),
        F.sum(q(lw * ly)).alias("sxy"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    slope = (d("k") * d("sxy") - d("sx") * d("sy") / 1e9) / (
        d("k") * d("sxx") - d("sx") * d("sx") / 1e9
    )
    return terms.crossJoin(F.broadcast(nd)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("n_scales"),
        F.floor(slope * 1_000_000 + 0.5).cast("long").alias("hurst_micros"),
    )


# ---------------------------------------------------------------------------
# END-TO-END eval-corpus preparation (pipelines/evalprep.py): quality
# gate -> shingle decontamination against the benchmark set (doc_id <
# 20 plays the benchmark suite) -> content-hash train/val split ->
# context-window chunking. Every stage reuses an already-oracled
# operator, and the whole composition has one nested-CTE SQL oracle —
# the eval-data twin of q_pipeline_clean / q_pipeline_product.
# ---------------------------------------------------------------------------
_EVALPREP_ORACLE = f"""
    WITH corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
    ),
    bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 20
    ),
    gated AS (
      SELECT doc_id, text FROM corp WHERE len({_TOKENS_SQL}) >= 10
    ),
    corp_sh AS ({{sh_corp}}),
    bench_sh AS ({{sh_bench}}),
    contam AS (
      SELECT DISTINCT doc FROM (
        SELECT c.doc AS doc, b.doc AS bd
        FROM corp_sh c JOIN bench_sh b ON c.shingle = b.shingle
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
      )
    ),
    clean AS (
      SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc FROM contam)
    ),
    labeled AS (
      SELECT doc_id, text,
             CASE WHEN {{split_pred}} THEN 'val' ELSE 'train' END AS split
      FROM clean
    ),
    chunked AS (
      SELECT doc_id, split,
             unnest(list_transform(
               range(1, greatest(len({_TOKENS_SQL}), 1) + 1, 40),
               s -> {{{{'idx': CAST((s - 1) / 40 AS BIGINT),
                      'toks': list_slice({_TOKENS_SQL}, s, s + 49)}}}}
             )) AS c
      FROM labeled
    )
    SELECT doc_id, split, c.idx AS chunk_idx,
           md5(array_to_string(c.toks, ' ')) AS chunk_fp,
           len(c.toks) AS n_chunk_tokens
    FROM chunked WHERE len(c.toks) > 0
"""


@register(
    "q_pipeline_evalprep",
    _EVALPREP_ORACLE.format(
        sh_corp=_SHINGLES_SQL.format(
            tokens="list_slice(" + _TOKENS_SQL + ", 1, len(" + _TOKENS_SQL + "))",
            corpus="SELECT * FROM gated",
        ),
        sh_bench=_SHINGLES_SQL.format(
            tokens="list_slice(" + _TOKENS_SQL + ", 1, len(" + _TOKENS_SQL + "))",
            corpus="SELECT * FROM bench",
        ),
        split_pred=sample_ops.hash_sample_sql("doc_id", 0.1, seed="split"),
    ),
)
def q_pipeline_evalprep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.pipelines.evalprep import prepare_eval_corpus

    docs = load_table(spark, sf_dir, "documents")
    return prepare_eval_corpus(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        min_tokens=10,
        shingle_n=3,
        min_shared=3,
        val_fraction=0.1,
        max_tokens=50,
        overlap=10,
        seed="split",
    )


# ---------------------------------------------------------------------------
# BPE training's first step, fully oracled: the top adjacent
# character-pair frequencies over the lowercase-word vocabulary
# (weighted by word count). The iterative trainer (functions/bpe.py
# train_bpe) reuses exactly this relation per merge; its multi-step
# loop is witnessed by the differential pytest against a pure-Python
# BPE reference (tests/test_bpe.py), per the engine's convention for
# iterative algorithms.
# ---------------------------------------------------------------------------
@register(
    "q_bpe_pairs",
    f"""
    WITH wc AS (
      SELECT tok AS word, COUNT(*) AS cnt
      FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
      WHERE regexp_full_match(tok, '^[a-z]+$')
      GROUP BY tok
    ), pairs AS (
      SELECT s[i] || ' ' || s[i+1] AS pair, cnt
      FROM (SELECT string_split(word, '') AS s, cnt FROM wc),
           unnest(range(1, greatest(len(s), 1))) AS u(i)
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.bpe import pair_counts, word_symbol_counts

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    vocab = word_symbol_counts(docs, "text")
    return (
        pair_counts(vocab)
        .select("pair", F.col("n").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup accounting: after context-window chunking
# (q_chunk_docs parameters), what fraction of each doc's chunks is a
# byte-identical copy of a chunk seen earlier in the corpus?
# Packing pipelines drop those copies — repeated-chunk mass is
# training compute wasted on the same gradient. Canonical occurrence
# = global min (doc_id, chunk_idx) per fingerprint; one groupBy on
# the chunk hash, exact integers throughout.
# ---------------------------------------------------------------------------
@register(
    "q_chunk_dedup",
    f"""
    WITH chunked AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len({_TOKENS_SQL}), 1) + 1, 40),
               s -> {{'idx': CAST((s - 1) / 40 AS BIGINT),
                      'toks': list_slice({_TOKENS_SQL}, s, s + 49)}}
             )) AS c
      FROM documents
    ), chunks AS (
      SELECT doc_id, c.idx AS chunk_idx,
             md5(array_to_string(c.toks, ' ')) AS fp
      FROM chunked WHERE len(c.toks) > 0
    ), canon AS (
      SELECT fp, COUNT(*) AS n, MIN(doc_id * 1000000 + chunk_idx) AS first_key
      FROM chunks GROUP BY fp
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN k.n >= 2
                          AND c.doc_id * 1000000 + c.chunk_idx <> k.first_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(FLOOR(SUM(CASE WHEN k.n >= 2
                          AND c.doc_id * 1000000 + c.chunk_idx <> k.first_key
                               THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
                * 1000000 + 0.5) AS BIGINT) AS dup_frac_micros
    FROM chunks c JOIN canon k USING (fp)
    GROUP BY c.doc_id
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.pipelines.chunking import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "doc_id", "text", max_tokens=50, overlap=10).select(
        "doc_id",
        "chunk_idx",
        F.md5(F.col("chunk_text")).alias("fp"),
        (F.col("doc_id") * 1000000 + F.col("chunk_idx")).alias("okey"),
    )
    canon = chunks.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"), F.min("okey").alias("first_key")
    )
    dup = F.when(
        (F.col("n") >= 2) & (F.col("okey") != F.col("first_key")), 1
    ).otherwise(0)
    return (
        chunks.join(canon, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            F.floor(F.sum(dup) * 1.0 / F.count(F.lit(1)) * 1_000_000 + 0.5)
            .cast("long")
            .alias("dup_frac_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Repeated-span length distribution: merge each doc's excised
# 8-gram intervals (q_substring_dedup's duplicate occurrences) into
# maximal contiguous spans — the classic gaps-and-islands pass over
# the SPARSE duplicate-position relation (never the token stream) —
# and histogram the merged span lengths. Long spans = whole-passage
# boilerplate; short spans = incidental phrase reuse; curators tune
# the excision threshold from exactly this curve.
# ---------------------------------------------------------------------------
@register(
    "q_dup_span_lengths",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, ' +'), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i+1:i+8], ' ')) AS h,
             doc_id * 1000000 + i AS okey
      FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ),
    canon AS (
      SELECT h, COUNT(*) AS c, MIN(okey) AS first_key
      FROM grams GROUP BY h HAVING COUNT(*) >= 2
    ),
    dups AS (
      SELECT g.doc_id, g.pos, g.pos + 7 AS pend
      FROM grams g JOIN canon c USING (h)
      WHERE g.okey <> c.first_key
    ),
    isl AS (
      SELECT doc_id, pos, pend,
             CASE WHEN pos > COALESCE(MAX(pend) OVER (PARTITION BY doc_id
                    ORDER BY pos, pend
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM dups
    ),
    grp AS (
      SELECT doc_id, pos, pend,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos, pend
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island,
             MAX(pend) - MIN(pos) + 1 AS span_len
      FROM grp GROUP BY doc_id, island
    )
    SELECT CAST(span_len AS BIGINT) AS span_len,
           COUNT(*) AS n_spans
    FROM spans GROUP BY span_len
    """,
)
def q_dup_span_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.expr("filter(split(text, ' +'), x -> x != '')").alias("_toks"),
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(_toks) >= 8 THEN "
                "transform(sequence(0, size(_toks) - 8), "
                "i -> md5(concat_ws(' ', slice(_toks, i + 1, 8)))) "
                "ELSE array() END"
            )
        ).alias("pos", "h"),
    ).withColumn("okey", F.col("doc_id") * 1000000 + F.col("pos"))
    canon = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"), F.min("okey").alias("first_key"))
        .filter(F.col("c") >= 2)
    )
    dups = (
        grams.join(canon, "h")
        .filter(F.col("okey") != F.col("first_key"))
        .select("doc_id", "pos", (F.col("pos") + 7).alias("pend"))
    )
    # gaps-and-islands over the sparse duplicate-position relation,
    # partitioned by doc (bounded per doc, never the token stream)
    w = Window.partitionBy("doc_id").orderBy("pos", "pend")
    prev_end = F.max("pend").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = dups.withColumn(
        "new_island",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    grp = isl.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = grp.groupBy("doc_id", "island").agg(
        (F.max("pend") - F.min("pos") + 1).alias("span_len")
    )
    return spans.groupBy(F.col("span_len").cast("long").alias("span_len")).agg(
        F.count(F.lit(1)).alias("n_spans")
    )


# ---------------------------------------------------------------------------
# Per-dimension quantile clipping bounds for the embedding table —
# the preprocessing step before fixed-point quantization or PQ
# training (outlier dimensions blow up codebook ranges). Exact
# p1/p99 per dimension from the per-(dim, value) count relation via
# the grouped two-phase prefix sum — never a per-row rank — with
# integer ceil targets; the outside-mass recount joins the bounded
# 64-row bounds relation back to the value counts.
# ---------------------------------------------------------------------------
@register(
    "q_embed_dim_clip",
    """
    WITH ex AS (
      SELECT i, CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS e
      FROM embeddings, range(1, 65) t(i)
    ), vals AS (
      SELECT i, e, COUNT(*) AS cnt FROM ex GROUP BY i, e
    ), cum AS (
      SELECT i, e, cnt,
             SUM(cnt) OVER (PARTITION BY i ORDER BY e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             SUM(cnt) OVER (PARTITION BY i) AS n
      FROM vals
    ), bounds AS (
      SELECT i, MIN(n) AS n,
             MIN(CASE WHEN c >= (n + 99) // 100 THEN e END) AS p01,
             MIN(CASE WHEN c >= (99 * n + 99) // 100 THEN e END) AS p99
      FROM cum GROUP BY i
    )
    SELECT b.i AS dim, CAST(b.n AS BIGINT) AS n,
           CAST(b.p01 AS BIGINT) AS p01_fixed,
           CAST(b.p99 AS BIGINT) AS p99_fixed,
           CAST(SUM(CASE WHEN v.e < b.p01 OR v.e > b.p99
                         THEN v.cnt ELSE 0 END) AS BIGINT) AS n_outside
    FROM bounds b JOIN vals v ON v.i = b.i
    GROUP BY b.i, b.n, b.p01, b.p99
    """,
)
def q_embed_dim_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.ranking import grouped_prefix_sum

    emb = core_ops.spread(load_table(spark, sf_dir, "embeddings"))
    ex = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding, "
                "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))"
            )
        ).alias("i0", "e")
    ).select((F.col("i0") + 1).alias("i"), "e")
    vals = ex.groupBy("i", "e").agg(F.count(F.lit(1)).alias("cnt"))
    cum = grouped_prefix_sum(vals, ["i"], ["e"], "cnt", cum_col="c", total_col="n")
    t1 = F.expr("(n + 99) DIV 100")
    t99 = F.expr("(99 * n + 99) DIV 100")
    bounds = cum.groupBy("i").agg(
        F.min("n").alias("n"),
        F.min(F.when(F.col("c") >= t1, F.col("e"))).alias("p01"),
        F.min(F.when(F.col("c") >= t99, F.col("e"))).alias("p99"),
    )
    return (
        vals.join(F.broadcast(bounds), "i")
        .groupBy(
            F.col("i").cast("long").alias("dim"),
            F.col("n").cast("long").alias("n"),
            F.col("p01").cast("long").alias("p01_fixed"),
            F.col("p99").cast("long").alias("p99_fixed"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("e") < F.col("p01")) | (F.col("e") > F.col("p99")),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outside")
        )
    )


# ---------------------------------------------------------------------------
# Per-customer lag features: the feature-engineering pass a churn /
# LTV model trains on — previous order value, days since previous
# order, and the trailing-3 average — in ONE window pass partitioned
# by the high-cardinality customer key (parallelism = |customers|,
# the correct direction; contrast the low-cardinality windows the
# two-phase rank exists for). Monetary trailing mean closes with the
# pure integer rounding division.
# ---------------------------------------------------------------------------
@register(
    "q_lag_features",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(prev_micros AS BIGINT) AS prev_micros,
           CAST(gap_days AS BIGINT) AS gap_days,
           CAST((s3 + n3 // 2) // n3 AS BIGINT) AS avg3_micros
    FROM (
      SELECT o_custkey, o_orderkey,
             LAG({_MICROS_SQL.format(expr='o_totalprice')})
               OVER w AS prev_micros,
             CAST(o_orderdate AS DATE)
               - LAG(CAST(o_orderdate AS DATE)) OVER w AS gap_days,
             SUM(CAST({_MICROS_SQL.format(expr='o_totalprice')} AS HUGEINT))
               OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
             COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n3
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    """,
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, 0)
    v = _micros(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag(v).over(w).alias("prev_micros"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap_days"),
        F.sum(v.cast("decimal(38,0)")).over(w3).alias("s3"),
        F.count(F.lit(1)).over(w3).alias("n3"),
    ).select(
        "o_custkey",
        "o_orderkey",
        "prev_micros",
        "gap_days",
        F.expr(
            "CAST((s3 + n3 DIV 2) DIV n3 AS BIGINT)"
        ).alias("avg3_micros"),
    )


# ---------------------------------------------------------------------------
# Inverse-frequency class weights over the embedding labels — the
# standard imbalanced-training prep (w_c = n / (k * n_c)), exact via
# one aggregate + integer rounding division against the broadcast
# 1-row totals.
# ---------------------------------------------------------------------------
@register(
    "q_class_weights",
    """
    WITH c AS (
      SELECT label, COUNT(*) AS n_c FROM embeddings GROUP BY label
    ), t AS (SELECT SUM(n_c) AS n, COUNT(*) AS k FROM c)
    SELECT label, CAST(n_c AS BIGINT) AS n_c,
           CAST((n * 1000000 + (k * n_c) // 2) // (k * n_c) AS BIGINT)
             AS weight_micros
    FROM c CROSS JOIN t
    """,
)
def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_c"))
    t = c.agg(F.sum("n_c").alias("n"), F.count(F.lit(1)).alias("k"))
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n_c").cast("long").alias("n_c"),
        F.expr(
            "CAST((n * 1000000 + (k * n_c) DIV 2) DIV (k * n_c) AS BIGINT)"
        ).alias("weight_micros"),
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling for recommender training: for each
# of the first 50 customers, k=5 hash-derived candidate parts, with
# actually-purchased parts anti-joined away. The hash makes negatives
# reproducible across runs/engines/partitionings (no rand()), and
# candidate generation is a scan-stage explode — the positives
# anti-join is the only shuffle.
# ---------------------------------------------------------------------------
@register(
    "q_negative_sampling",
    """
    WITH users AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_custkey <= 50
    ), nparts AS (SELECT MAX(p_partkey) AS np FROM part),
    cand AS (
      SELECT c_custkey,
             1 + CAST('0x' || substr(md5(concat('neg#',
                   CAST(c_custkey AS VARCHAR), '-', CAST(i AS VARCHAR))), 1, 15)
                 AS BIGINT) % np AS part_id,
             i AS draw
      FROM users CROSS JOIN nparts, unnest(range(1, 6)) AS u(i)
    ), pos AS (
      SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS part_id
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey <= 50
    )
    SELECT c.c_custkey, CAST(c.part_id AS BIGINT) AS part_id,
           CAST(c.draw AS BIGINT) AS draw
    FROM cand c LEFT JOIN pos p
      ON p.c_custkey = c.c_custkey AND p.part_id = c.part_id
    WHERE p.part_id IS NULL
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.hashing import hash60

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    users = c.select("c_custkey").distinct()
    nparts = load_table(spark, sf_dir, "part").agg(
        F.max("p_partkey").alias("np")
    )
    key = F.concat(
        F.col("c_custkey").cast("string"), F.lit("-"), F.col("draw").cast("string")
    )
    cand = (
        users.crossJoin(F.broadcast(nparts))
        .withColumn("draw", F.explode(F.sequence(F.lit(1), F.lit(5))))
        .select(
            "c_custkey",
            (1 + hash60(key, seed="neg") % F.col("np")).alias("part_id"),
            F.col("draw").cast("long").alias("draw"),
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("part_id"),
        )
        .distinct()
    )
    return cand.join(pos, ["c_custkey", "part_id"], "left_anti").select(
        "c_custkey", F.col("part_id").cast("long").alias("part_id"), "draw"
    )


# ---------------------------------------------------------------------------
# Dataset card: the one-row corpus summary a curator publishes with
# a training set — size, token mass, vocabulary, exact-dup rate,
# language-mix entropy, mean length. Each figure is an established
# exact formulation (md5 fingerprints, nano-quantized p ln p terms,
# integer rounding division); the card is their 1-row-broadcast
# composition, so it costs a handful of aggregates, not a new scan
# per figure.
# ---------------------------------------------------------------------------
@register(
    "q_dataset_card",
    f"""
    WITH base AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS n_tokens,
             COUNT(DISTINCT md5(text)) AS n_distinct,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents
    ), vocab AS (
      SELECT COUNT(*) AS vocab_size FROM (
        SELECT DISTINCT tok FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
        WHERE tok <> ''
      )
    ), langs AS (
      SELECT CAST(SUM(CAST(FLOOR(-(n * 1.0 / t) * ln(n * 1.0 / t)
                * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS lang_entropy_nanos
      FROM (SELECT lang, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS t
            FROM documents GROUP BY lang)
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens,
           CAST(vocab_size AS BIGINT) AS vocab_size,
           CAST(n_docs - n_distinct AS BIGINT) AS n_exact_dups,
           CAST(FLOOR((n_docs - n_distinct) * 1.0 / n_docs * 1000000 + 0.5)
                AS BIGINT) AS dup_rate_micros,
           lang_entropy_nanos,
           CAST((sum_chars * 1000000 + n_docs // 2) // n_docs AS BIGINT)
             AS mean_chars_micros
    FROM base CROSS JOIN vocab CROSS JOIN langs
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(text_fns.tokens(F.col("text")))).alias("n_tokens"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        F.sum("n_chars").alias("sum_chars"),
    )
    vocab = (
        docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    lt = lc.agg(F.sum("n").alias("t"))
    p = F.col("n") * 1.0 / F.col("t")
    langs = (
        lc.crossJoin(F.broadcast(lt))
        .agg(
            F.sum(F.floor(-p * F.log(p) * 1_000_000_000 + 0.5).cast("long"))
            .cast("long")
            .alias("lang_entropy_nanos")
        )
    )
    dups = F.col("n_docs") - F.col("n_distinct")
    return (
        base.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(langs))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            dups.cast("long").alias("n_exact_dups"),
            F.floor(dups * 1.0 / F.col("n_docs") * 1_000_000 + 0.5)
            .cast("long")
            .alias("dup_rate_micros"),
            "lang_entropy_nanos",
            F.expr(
                "CAST((sum_chars * 1000000 + n_docs DIV 2) DIV n_docs AS BIGINT)"
            ).alias("mean_chars_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal split boundary: the leakage-free alternative to hash
# splits for time-series models — train on everything before the
# exact 90th-percentile order date, evaluate after. The boundary
# comes from the per-date count relation (calendar-bounded) with an
# exact integer 90% gate; one conditional aggregate counts the
# sides.
# ---------------------------------------------------------------------------
@register(
    "q_time_split",
    """
    WITH vals AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT d, cnt,
             SUM(cnt) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             SUM(cnt) OVER () AS n
      FROM vals
    ), b AS (
      SELECT MIN(d) AS split_day FROM cum WHERE 10 * c >= 9 * n
    )
    SELECT split_day,
           CAST(SUM(CASE WHEN d <= split_day THEN cnt ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(SUM(CASE WHEN d > split_day THEN cnt ELSE 0 END) AS BIGINT)
             AS n_test
    FROM vals CROSS JOIN b
    GROUP BY split_day
    """,
)
def q_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.ranking import grouped_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    vals = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cum = grouped_prefix_sum(vals, [], ["d"], "cnt", cum_col="c", total_col="n")
    b = cum.filter(10 * F.col("c") >= 9 * F.col("n")).agg(
        F.min("d").alias("split_day")
    )
    return (
        vals.crossJoin(F.broadcast(b))
        .groupBy("split_day")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("split_day"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(F.col("d") > F.col("split_day"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_test"),
        )
    )


# ---------------------------------------------------------------------------
# Filtered ANN: top-5 cosine neighbors CONSTRAINED to the query's
# own label — the metadata-filtered search every production vector
# store exposes (category-scoped retrieval). The filter composes
# INSIDE the join predicate, so pruned rows never reach the distance
# computation; exact fixed-point arithmetic as in q_ann_bruteforce.
# ---------------------------------------------------------------------------
_ANN_FILTERED_ORACLE = f"""
    WITH fixed AS (
      SELECT e.vec_id, e.label, f.i, f.e
      FROM embeddings e JOIN ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}) f
        ON f.vec_id = e.vec_id
    ),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c
        ON q.i = c.i AND q.vec_id <> c.vec_id AND q.label = c.label
      WHERE q.vec_id < 5
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
               neighbor_id) AS rank
      FROM dots
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON neighbor_id = nc.vec_id
    ) WHERE rank <= 5
"""


@register("q_ann_filtered", _ANN_FILTERED_ORACLE)
def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from frames_spark.dedup.embedding import _fixed
    from frames_spark.functions.vectors import cosine_from_fixed, dot_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    fixed = _fixed(emb, "vec_id", "embedding").join(
        emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
    )
    # query-set filter applied to the BASE table (vec_id, before any
    # alias) so it prunes ahead of the fixed-point transform — and so
    # the advisor's bounded-filter heuristic can prove the broadcast
    # side is an explicit id-pinned query set
    qe = emb.filter(F.col("vec_id") < 5)
    q = _fixed(qe, "vec_id", "embedding").join(
        qe.select(F.col("vec_id").alias("vid"), "label"), "vid"
    ).select(
        F.col("vid").alias("query_id"),
        F.col("fvec").alias("qvec"),
        F.col("n2").alias("qn2"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        fixed.join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel")) & (F.col("vid") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            cosine_from_fixed(
                dot_fixed(F.col("qvec"), F.col("fvec")), F.col("qn2"), F.col("n2")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped excess kurtosis (Fisher g2) per segment — the tail-weight
# companion to q_group_skewness, from ONE fused aggregate of exact
# deci-unit moments (x quantized to tenths keeps sum(x^4) inside 38
# digits through sf1000). The g2 combination closes in double with
# identical expression trees on both engines, micros-quantized.
# Headroom (tests/test_headroom.py): oracle-exact at 30x-amplified
# value magnitudes; at 1000x the sum-x^4 DECIMAL(38) ceiling RAISES
# under ANSI (verified raising-not-wrapping, never silent).
# ---------------------------------------------------------------------------
@register(
    "q_group_kurtosis",
    """
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)) AS s1,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s2,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s3,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s4
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s4 AS DOUBLE)
                - 4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)
                + 6.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                - 3.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
             / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             * 1000000 - 3000000 + 0.5) AS BIGINT) AS kurtosis_micros
    FROM m
    """,
)
def q_group_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    deci = F.floor(F.col("o_totalprice") * 10 + 0.5).cast("long")
    dec = "decimal(38,0)"
    m = (
        join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", deci.alias("x"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(dec)).alias("s1"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("s2"),
            F.sum(F.col("x").cast(dec) * F.col("x") * F.col("x")).alias("s3"),
            F.sum(
                F.col("x").cast(dec) * F.col("x") * F.col("x") * F.col("x")
            ).alias("s4"),
        )
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    num = d("n") * (
        d("n") * d("n") * d("s4")
        - 4.0 * d("n") * d("n") * d("s1") * d("s3")
        + 6.0 * d("n") * d("s1") * d("s1") * d("s2")
        - 3.0 * d("s1") * d("s1") * d("s1") * d("s1")
    )
    m2 = d("n") * d("s2") - d("s1") * d("s1")
    return m.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.floor(num / m2 / m2 * 1_000_000 - 3_000_000 + 0.5)
        .cast("long")
        .alias("kurtosis_micros"),
    )


# ---------------------------------------------------------------------------
# Shingle CONTAINMENT pairs: |A∩B| / |A| — the asymmetric companion
# to q_dedup_ngram's Jaccard. Jaccard misses subset relationships (a
# quoted excerpt scores low because the host doc is large);
# containment finds "A is inside B" directly, which is how quote /
# mirror / expansion dup detection works. Same shingle inverted
# index, ordered pairs, and a pure integer threshold gate
# (5 n_common >= 4 |A| ⇔ containment >= 0.8).
# ---------------------------------------------------------------------------
# Stop-shingle guard for the containment pair queries: shingles in
# more docs than this are dropped BEFORE pair generation (bounding
# every posting list), mirrored exactly in the oracle's HAVING gate.
_CONTAIN_MAX_DF = 64


@register(
    "q_containment",
    f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    shingled0 AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM corpus")}),
    rare AS (
      SELECT shingle FROM shingled0 GROUP BY shingle
      HAVING COUNT(*) <= {_CONTAIN_MAX_DF}
    ),
    shingled AS (SELECT s.* FROM shingled0 s JOIN rare USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM shingled GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
      FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc <> b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n_shingles AS DOUBLE)
             AS containment
    FROM inter JOIN sizes sa ON doc_a = sa.doc
    WHERE 5 * n_common >= 4 * sa.n_shingles
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candidate generation rides dedup/jaccard.py's posting-list
    # expansion (shingle lineage once, i<j pairs aggregated once,
    # ordered mirror via a post-agg row-local explode) with the
    # max_df stop-shingle guard — never a raw two-sided index
    # self-join, which a hot boilerplate shingle turns quadratic.
    docs = load_table(spark, sf_dir, "documents")
    return (
        jac_ops.containment_pairs(
            _with_near_copies(docs), "doc_id", "text", 3, max_df=_CONTAIN_MAX_DF
        )
        .filter(5 * F.col("n_common") >= 4 * F.col("n_shingles_a"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            "containment",
        )
    )


# ---------------------------------------------------------------------------
# Recall@k curve of the bucketed LSH ANN vs exact search — the third
# leg of the ANN quality triptych (q_embed_lsh_recall: pair recall;
# q_ann_mrr: rank position; this: cutoff sensitivity). Exact hit
# counts, integer rounding division per k, both sides fully modeled
# in the oracle.
# ---------------------------------------------------------------------------
@register(
    "q_recall_at_k",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    bf_dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                 neighbor_id) AS rn
        FROM bf_dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON neighbor_id = nc.vec_id
      ) WHERE rn <= 10
    ),
    planes(p, i, c) AS (VALUES {_ANN_PLANES_VALUES}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    buckets AS (
      SELECT vec_id, string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    lsh_dots AS (
      SELECT query_id, neighbor_id, SUM(a.e * b.e) AS dot
      FROM pairs
      JOIN fixed a ON a.vec_id = query_id
      JOIN fixed b ON b.vec_id = neighbor_id AND b.i = a.i
      GROUP BY query_id, neighbor_id
    ),
    lsh AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                 neighbor_id) AS rn
        FROM lsh_dots
        JOIN norms nq ON query_id = nq.vec_id
        JOIN norms nc ON neighbor_id = nc.vec_id
      ) WHERE rn <= 10
    ),
    ks(k) AS (VALUES (1), (5), (10)),
    nq AS (SELECT COUNT(DISTINCT query_id) AS n FROM exact)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(nq.n AS BIGINT) AS n_queries,
           CAST(COALESCE(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
           CAST((COALESCE(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) * 1000000
                 + (ks.k * nq.n) // 2) // (ks.k * nq.n) AS BIGINT) AS recall_micros
    FROM ks CROSS JOIN nq
    LEFT JOIN exact e ON e.rn <= ks.k
    LEFT JOIN lsh l ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
                    AND l.rn <= ks.k
    GROUP BY ks.k, nq.n
    """,
)
def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = ann_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("ern")
    )
    lsh = ann_ops.lsh_topk(emb, q, "vec_id", "embedding", k=10, num_planes=4).select(
        "query_id", "neighbor_id", F.col("rank").alias("lrn")
    )
    nq = exact.agg(F.countDistinct("query_id").alias("n"))
    ks = emb.sparkSession.createDataFrame([(1,), (5,), (10,)], "k long")
    joined = exact.join(lsh, ["query_id", "neighbor_id"], "left")
    hits = (
        F.broadcast(ks)
        .crossJoin(F.broadcast(nq))
        .join(
            joined,
            (joined["ern"] <= F.col("k")) & (joined["lrn"] <= F.col("k")),
            "left",
        )
        .groupBy("k", "n")
        .agg(
            F.sum(
                F.when(F.col("neighbor_id").isNotNull(), 1).otherwise(0)
            ).alias("n_hits")
        )
    )
    return hits.select(
        "k",
        F.col("n").cast("long").alias("n_queries"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.expr(
            "CAST((n_hits * 1000000 + (k * n) DIV 2) DIV (k * n) AS BIGINT)"
        ).alias("recall_micros"),
    )


# ---------------------------------------------------------------------------
# Dedup-family summary: every tier of the dedup ladder measured on
# the SAME corpus (the near-copy-augmented set all the dedup oracles
# share) in one row — exact-dup docs, greedy MinHash-LSH near-dup
# drops, asymmetric containment pairs, and substring-level tokens
# excised. The comparative rollup a curator reads before choosing
# which tiers to enable; each figure reuses its tier's established
# exact formulation.
# ---------------------------------------------------------------------------
@register(
    "q_dedup_summary",
    _MH_CTES + f"""
    , stoks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, ' +'), x -> x <> '') AS t
      FROM corpus
    ),
    sgrams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i+1:i+8], ' ')) AS h,
             doc_id * 1000000 + i AS okey
      FROM stoks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
    ),
    scanon AS (
      SELECT h, MIN(okey) AS fk FROM sgrams GROUP BY h HAVING COUNT(*) >= 2
    ),
    sdups AS (
      SELECT g.doc_id, g.pos FROM sgrams g JOIN scanon c USING (h)
      WHERE g.okey <> c.fk
    ),
    tokrows AS (
      SELECT doc_id, unnest(range(0, len(t))) AS i FROM stoks
    ),
    covered AS (
      SELECT DISTINCT r.doc_id, r.i
      FROM tokrows r JOIN sdups d
        ON d.doc_id = r.doc_id AND r.i BETWEEN d.pos AND d.pos + 7
    ),
    crare AS (
      SELECT shingle FROM shingled GROUP BY shingle
      HAVING COUNT(*) <= {_CONTAIN_MAX_DF}
    ),
    ckept AS (SELECT s.* FROM shingled s JOIN crare USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n FROM ckept GROUP BY doc),
    inter AS (
      SELECT a.doc AS da, b.doc AS db, COUNT(*) AS nc
      FROM ckept a JOIN ckept b
        ON a.shingle = b.shingle AND a.doc <> b.doc
      GROUP BY 1, 2
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_docs,
           (SELECT CAST(SUM(len(t)) AS BIGINT) FROM stoks) AS n_tokens,
           (SELECT CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
            FROM corpus) AS exact_dup_docs,
           (SELECT CAST(COUNT(DISTINCT doc_b) AS BIGINT)
            FROM ({_MH_PAIRS_SELECT})) AS near_dup_docs_greedy,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM inter JOIN sizes sa ON da = sa.doc
            WHERE 5 * nc >= 4 * sa.n) AS containment_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM covered)
             AS substring_tokens_removed
    """,
)
def q_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.dedup.substring import excise_repeated_ngrams

    docs = load_table(spark, sf_dir, "documents")
    corpus = core_ops.spread(_with_near_copies(docs))
    # one corpus scan for the scalar counters (docs / distinct / tokens)
    base = corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        F.sum(
            F.size(F.expr("filter(split(text, ' +'), x -> x != '')"))
        ).alias("n_tokens"),
    )
    # ONE shingle index feeds both the MinHash and containment tiers;
    # persisted (memory-and-disk) so the corpus is scanned and
    # shingled once, not once per tier.
    sh = jac_ops.shingle_index(corpus, "doc_id", "text", 3).persist()
    sigs = mh_ops.minhash_signatures_from_index(sh, num_hashes=_MH_K)
    near = (
        mh_ops.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)
        .agg(F.countDistinct("doc_b").alias("near_dup_docs_greedy"))
    )
    # containment leg reuses the repaired posting-list + max_df tier
    # (q_containment's exact formulation — never a raw index self-join)
    cont = (
        jac_ops.containment_pairs_from_index(sh, max_df=_CONTAIN_MAX_DF)
        .filter(5 * F.col("n_common") >= 4 * F.col("n_shingles_a"))
        .agg(F.count(F.lit(1)).alias("containment_pairs"))
    )
    sub = excise_repeated_ngrams(corpus, "doc_id", "text", n=8).agg(
        F.sum("n_removed").alias("substring_tokens_removed")
    )
    return (
        base.crossJoin(F.broadcast(near))
        .crossJoin(F.broadcast(cont))
        .crossJoin(F.broadcast(sub))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_docs") - F.col("n_distinct"))
            .cast("long")
            .alias("exact_dup_docs"),
            F.col("near_dup_docs_greedy").cast("long").alias("near_dup_docs_greedy"),
            F.col("containment_pairs").cast("long").alias("containment_pairs"),
            F.col("substring_tokens_removed")
            .cast("long")
            .alias("substring_tokens_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Entropy RATE of the event process: -sum p(cur,next) ln p(next|cur)
# — the single-number predictability summary over q_cond_entropy's
# per-state table (how many bits each step of user behavior carries).
# Per-transition nano-quantized terms, exact integer sums.
# ---------------------------------------------------------------------------
@register(
    "q_entropy_rate",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), cnt AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), ct AS (SELECT cur, SUM(n) AS t FROM cnt GROUP BY cur),
    tot AS (SELECT SUM(n) AS g FROM cnt)
    SELECT CAST(tot.g AS BIGINT) AS n_transitions,
           CAST(SUM(CAST(FLOOR(-(c.n * 1.0 / tot.g) * ln(c.n * 1.0 / ct.t)
                * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS entropy_rate_nanos_sum
    FROM cnt c JOIN ct ON c.cur = ct.cur CROSS JOIN tot
    GROUP BY tot.g
    """,
)
def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ct = cnt.groupBy("cur").agg(F.sum("n").alias("t"))
    tot = cnt.agg(F.sum("n").alias("g"))
    term = F.floor(
        -(F.col("n") * 1.0 / F.col("g"))
        * F.log(F.col("n") * 1.0 / F.col("t"))
        * 1_000_000_000
        + 0.5
    ).cast("long")
    return (
        cnt.join(F.broadcast(ct), "cur")
        .crossJoin(F.broadcast(tot))
        .groupBy("g")
        .agg(F.sum(term).alias("entropy_rate_nanos_sum"))
        .select(
            F.col("g").cast("long").alias("n_transitions"),
            F.col("entropy_rate_nanos_sum").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# HTML extraction (functions/html.py): crawl payload -> visible text.
# The driver tables carry clean text, so the query builds the
# deterministic HTML wrapping INSIDE the query (markup, script/style,
# comments, entities) and extracts it back — both sides of the oracle
# model the exact same wrap + the exact same regexp chain (the chain
# literals are shared via html_to_text_sql, so the oracle is a true
# twin, not a reimplementation). In production the input is
# sources/warc.py response payloads (pytest-covered).
# ---------------------------------------------------------------------------
from frames_spark.functions.html import html_to_text, html_to_text_sql  # noqa: E402

_HTML_WRAP_PRE = (
    '<html><head><title>d</title><style>p {margin: 0}</style>'
    '<script>var n = 1;</script></head><body><!-- head --><h1>Doc '
)
_HTML_WRAP_MID = "</h1><p>"
_HTML_WRAP_POST = '</p><br><div>footer &amp; "quoted"</div></body></html>'

_HTML_WRAPPED_SQL = (
    f"'{_HTML_WRAP_PRE}' || CAST(doc_id AS VARCHAR) || "
    f"'{_HTML_WRAP_MID}' || text || "
    + "'"
    + _HTML_WRAP_POST.replace('"', '"')
    + "'"
)


def _html_wrapped_col() -> F.Column:
    return F.concat(
        F.lit(_HTML_WRAP_PRE),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_WRAP_MID),
        F.col("text"),
        F.lit(_HTML_WRAP_POST),
    )


@register(
    "q_html_extract",
    f"""
    WITH ex AS (
      SELECT doc_id, {html_to_text_sql(_HTML_WRAPPED_SQL)} AS text
      FROM documents
    )
    SELECT doc_id,
           md5(text) AS fp,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens
    FROM ex
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    ex = docs.select(
        "doc_id", html_to_text(_html_wrapped_col()).alias("text")
    )
    return ex.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.length("text").cast("long").alias("n_chars"),
        text_fns.n_tokens(F.col("text")).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Crawl-shaped mini pipeline: HTML wrap -> extract -> quality gate ->
# per-source accounting. The first stages every real crawl corpus
# runs (WARC payload -> text -> gates), with the extraction chain and
# the gates both fully modeled in the oracle.
# ---------------------------------------------------------------------------
@register(
    "q_html_pipeline",
    f"""
    WITH ex AS (
      SELECT doc_id, source,
             {html_to_text_sql(_HTML_WRAPPED_SQL)} AS text
      FROM documents
    ),
    gated AS (
      SELECT source, len({_TOKENS_SQL}) AS nt
      FROM ex
      WHERE len({_TOKENS_SQL}) >= 10
        AND CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) <= 0.2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM gated GROUP BY source
    """,
)
def q_html_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    ex = docs.select(
        "doc_id", "source", html_to_text(_html_wrapped_col()).alias("text")
    )
    text = F.col("text")
    gated = ex.filter(
        (text_fns.n_tokens(text) >= 10)
        & (text_fns.punct_ratio(text) <= 0.2)
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(text_fns.n_tokens(text)).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization tier (functions/text.py unicode_normalize /
# strip_invisible): visually identical text must produce ONE dedup
# key. The query plants three variant families over every document —
# precomposed é, decomposed e + combining acute (U+0301), and
# zero-width-polluted — and counts distinct fingerprints with and
# without the Unicode tier. Raw keys split the variants; NFC +
# invisible-strip collapses precomposed/decomposed into one key and
# zero-width copies into the original. DuckDB's nfc_normalize()
# models NFC exactly, so the oracle is full-value.
# ---------------------------------------------------------------------------
@register(
    "q_unicode_dedup",
    """
    WITH v AS (
      SELECT doc_id, 'orig' AS variant, text FROM documents
      UNION ALL
      SELECT doc_id, 'pre', replace(text, 'e', chr(233)) FROM documents
      UNION ALL
      SELECT doc_id, 'dec', replace(text, 'e', 'e' || chr(769)) FROM documents
      UNION ALL
      SELECT doc_id, 'zw', replace(text, ' ', ' ' || chr(8203)) FROM documents
    ),
    f AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_raw,
             md5(trim(regexp_replace(lower(
               nfc_normalize(regexp_replace(text,
                 '[' || chr(8203) || chr(8204) || chr(8205) || chr(8288)
                     || chr(65279) || chr(173) || ']', '', 'g'))),
               '\\s+', ' ', 'g'))) AS fp_norm
      FROM v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT fp_raw) AS BIGINT) AS n_keys_raw,
           CAST(COUNT(DISTINCT fp_norm) AS BIGINT) AS n_keys_unicode
    FROM f
    """,
)
def q_unicode_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    v = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("orig").alias("variant"), t.alias("text")),
                F.struct(
                    F.lit("pre").alias("variant"),
                    F.replace(t, F.lit("e"), F.lit("\u00e9")).alias("text"),
                ),
                F.struct(
                    F.lit("dec").alias("variant"),
                    F.replace(t, F.lit("e"), F.lit("e\u0301")).alias("text"),
                ),
                F.struct(
                    F.lit("zw").alias("variant"),
                    F.replace(t, F.lit(" "), F.lit(" \u200b")).alias("text"),
                ),
            )
        ).alias("v"),
    ).select("doc_id", F.col("v.text").alias("text"))
    vt = F.col("text")
    return v.select(
        text_fns.fingerprint(vt).alias("fp_raw"),
        F.md5(
            text_fns.normalize(
                vt, unicode_form="NFC", strip_invisibles=True
            )
        ).alias("fp_norm"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("fp_raw").cast("long").alias("n_keys_raw"),
        F.countDistinct("fp_norm").cast("long").alias("n_keys_unicode"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition battery (functions/gopher.py, Rae et al. 2021
# Table A1): dup-line fraction, dup-paragraph fraction, and the
# character fraction of the single most frequent {2,3,4}-gram, per
# document. Spark side is pure scan expressions (windows + sorted-run
# fold — no shuffle at any corpus size); the oracle recomputes every
# signal relationally (unnest + GROUP BY + ROW_NUMBER with the same
# cnt DESC, gram ASC tie-break). Micros-quantized integers.
# ---------------------------------------------------------------------------
from frames_spark.functions import gopher as gopher_fns  # noqa: E402


@register(
    "q_gopher_repetition",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKENS_SQL} AS t, length({_NORM_SQL}) AS tc
      FROM documents
    ),
    win AS (
      SELECT doc_id, tc,
             list_transform(range(0, CAST((len(t) + 7) // 8 AS INT)),
                            i -> array_to_string(t[8*i+1 : 8*i+8], ' ')) AS ls,
             list_transform(range(0, CAST((len(t) + 31) // 32 AS INT)),
                            i -> array_to_string(t[32*i+1 : 32*i+32], ' ')) AS ps
      FROM base
    ),
    g AS (
      SELECT doc_id, 2 AS n,
             unnest(CASE WHEN len(t) >= 2 THEN
               list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS gram FROM base
      UNION ALL
      SELECT doc_id, 3,
             unnest(CASE WHEN len(t) >= 3 THEN
               list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
               ELSE [] END) FROM base
      UNION ALL
      SELECT doc_id, 4,
             unnest(CASE WHEN len(t) >= 4 THEN
               list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))
               ELSE [] END) FROM base
    ),
    cnt AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
    top AS (
      SELECT doc_id, n, c, gram FROM (
        SELECT doc_id, n, c, gram,
               ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                  ORDER BY c DESC, gram ASC) AS rn
        FROM cnt
      ) WHERE rn = 1
    )
    SELECT w.doc_id,
           CAST(((len(ls) - len(list_distinct(ls))) * 1000000 + len(ls) // 2)
                // len(ls) AS BIGINT) AS dup_line_frac_micros,
           CAST(((len(ps) - len(list_distinct(ps))) * 1000000 + len(ps) // 2)
                // len(ps) AS BIGINT) AS dup_para_frac_micros,
           CAST(COALESCE((t2.c * length(t2.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                AS BIGINT) AS top2_char_frac_micros,
           CAST(COALESCE((t3.c * length(t3.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                AS BIGINT) AS top3_char_frac_micros,
           CAST(COALESCE((t4.c * length(t4.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                AS BIGINT) AS top4_char_frac_micros
    FROM win w
    LEFT JOIN top t2 ON t2.doc_id = w.doc_id AND t2.n = 2
    LEFT JOIN top t3 ON t3.doc_id = w.doc_id AND t3.n = 3
    LEFT JOIN top t4 ON t4.doc_id = w.doc_id AND t4.n = 4
    """,
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pre = docs.select(
        "doc_id",
        text_fns.tokens(F.col("text")).alias("_toks"),
        F.length(text_fns.normalize(F.col("text"))).cast("long").alias("_tc"),
    )
    sig = gopher_fns.repetition_signals(F.col("_toks"), F.col("_tc"))
    return pre.select(
        "doc_id", *[c.alias(name) for name, c in sig.items()]
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality statistic per segment: JB = n/6 (g1² + g2²/4)
# over the same deci-unit exact moment sums the skewness/kurtosis
# queries use (one fused aggregate; sum x⁴ protected by the deci
# quantization through sf1000 row counts). g1/g2 close in double with
# IDENTICAL expression trees on both engines; JB micros-quantized.
# Differential-tested against an independent numpy computation.
# ---------------------------------------------------------------------------
@register(
    "q_jarque_bera",
    """
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)) AS s1,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s2,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s3,
             SUM(CAST(CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT) AS HUGEINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)
                 * CAST(FLOOR(o_totalprice * 10 + 0.5) AS BIGINT)) AS s4
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(
             CAST(n AS DOUBLE) / 6.0 * (
               ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
                 - 3.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / pow(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 1.5))
               * ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
                 - 3.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / pow(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 1.5))
               + ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s4 AS DOUBLE)
                   - 4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)
                   + 6.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - 3.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  - 3.0)
               * ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s4 AS DOUBLE)
                   - 4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)
                   + 6.0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - 3.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  - 3.0)
               / 4.0
             ) * 1000000 + 0.5) AS BIGINT) AS jb_micros
    FROM m
    """,
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    deci = F.floor(F.col("o_totalprice") * 10 + 0.5).cast("long")
    dec = "decimal(38,0)"
    x = F.col("x")
    m = (
        join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", deci.alias("x"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(dec)).alias("s1"),
            F.sum(x.cast(dec) * x).alias("s2"),
            F.sum(x.cast(dec) * x * x).alias("s3"),
            F.sum(x.cast(dec) * x * x * x).alias("s4"),
        )
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    den = d("n") * d("s2") - d("s1") * d("s1")
    g1 = (
        d("n") * d("n") * d("s3")
        - 3.0 * d("n") * d("s1") * d("s2")
        + 2.0 * d("s1") * d("s1") * d("s1")
    ) / F.pow(den, 1.5)
    g2 = (
        d("n") * d("n") * d("n") * d("s4")
        - 4.0 * d("n") * d("n") * d("s1") * d("s3")
        + 6.0 * d("n") * d("s1") * d("s1") * d("s2")
        - 3.0 * d("s1") * d("s1") * d("s1") * d("s1")
    ) / den / den - 3.0
    jb = d("n") / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    return m.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.floor(jb * 1_000_000 + 0.5).cast("long").alias("jb_micros"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation statistic of daily revenue residuals.
# Exactness: residuals are scaled to integers (e'_t = n·x_t − S with
# x_t exact day cents — the n² factor cancels in the ratio), both
# quadratic sums accumulate in DECIMAL(38)/HUGEINT, and only the
# final ratio closes in double. The lag runs over the DAILY relation
# (thousands of rows post-aggregation — the legitimate tiny-relation
# window, never a fact-scale one).
# ---------------------------------------------------------------------------
@register(
    "q_durbin_watson",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM daily),
    e AS (
      SELECT d,
             CAST(tot.n AS HUGEINT) * x - tot.s AS ep,
             LAG(CAST(tot.n AS HUGEINT) * x - tot.s)
               OVER (ORDER BY d) AS ep_prev
      FROM daily CROSS JOIN tot
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_days,
           CAST(FLOOR(
             CAST(SUM(CASE WHEN ep_prev IS NULL THEN CAST(0 AS HUGEINT)
                           ELSE (ep - ep_prev) * (ep - ep_prev) END) AS DOUBLE)
             / CAST(SUM(ep * ep) AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS dw_micros
    FROM e
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = (
        o.select(F.col("o_orderdate").cast("date").alias("d"), cents.alias("c"))
        .groupBy("d")
        .agg(F.sum("c").alias("x"))
    )
    dec = "decimal(38,0)"
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("x").cast(dec)).alias("s")
    )
    ep = F.col("n").cast(dec) * F.col("x") - F.col("s")
    w = Window.orderBy("d")
    e = (
        daily.crossJoin(F.broadcast(tot))
        .select("d", "n", ep.alias("ep"))
        .withColumn("ep_prev", F.lag("ep").over(w))
    )
    diff = F.col("ep") - F.col("ep_prev")
    return e.groupBy("n").agg(
        F.floor(
            F.sum(
                F.when(F.col("ep_prev").isNull(), F.lit(0).cast(dec))
                .otherwise(diff * diff)
            ).cast("double")
            / F.sum(F.col("ep") * F.col("ep")).cast("double")
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("dw_micros")
    ).select(F.col("n").cast("long").alias("n_days"), "dw_micros")


# ---------------------------------------------------------------------------
# Type-token ratio + hapax profile per source: vocabulary richness,
# the lexical-diversity gate of a corpus card. One explode + two
# exact integer aggregations; ratios by integer rounding division.
# ---------------------------------------------------------------------------
@register(
    "q_ttr",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    st AS (
      SELECT source, term, COUNT(*) AS n FROM tok
      WHERE term <> '' GROUP BY source, term
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST((COUNT(*) * 1000000 + SUM(n) // 2) // SUM(n) AS BIGINT)
             AS ttr_micros,
           CAST((SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
                 + COUNT(*) // 2) // COUNT(*) AS BIGINT) AS hapax_micros
    FROM st GROUP BY source
    """,
)
def q_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    st = (
        docs.select(
            "source", F.explode(text_fns.tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = st.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.expr(
            "CAST((n_types * 1000000 + n_tokens DIV 2) DIV n_tokens AS BIGINT)"
        ).alias("ttr_micros"),
        F.expr(
            "CAST((n_hapax * 1000000 + n_types DIV 2) DIV n_types AS BIGINT)"
        ).alias("hapax_micros"),
    )


# ---------------------------------------------------------------------------
# C4-style LINE-level dedup accounting: the same fixed 8-token
# windows the Gopher battery uses as "lines", deduplicated
# corpus-wide — every non-first occurrence of a globally repeated
# line is removed (first occurrence = min(doc_id, idx), exactly the
# ExactSubstr keep rule at line granularity). One posexplode + ONE
# map-side-combining shuffle on the line hash; per-doc accounting by
# a second uniform-key aggregation. Complements q_substring_dedup
# (span granularity) and q_boilerplate (detection).
# ---------------------------------------------------------------------------
@register(
    "q_line_dedup",
    f"""
    WITH base AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
    lines AS (
      SELECT doc_id, len(t) AS nt, i AS idx,
             array_to_string(t[8*i+1 : 8*i+8], ' ') AS line
      FROM base, unnest(range(0, CAST((len(t) + 7) // 8 AS INT))) AS u(i)
    ),
    marked AS (
      SELECT doc_id, nt, idx,
             COUNT(*) OVER (PARTITION BY line) AS c,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
      FROM lines
    ),
    dups AS (
      SELECT doc_id, least(8, nt - 8 * idx) AS w
      FROM marked WHERE c >= 2 AND rn > 1
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS lines_removed, SUM(w) AS tokens_removed
      FROM dups GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.t) AS BIGINT) AS n_tokens,
           CAST((len(b.t) + 7) // 8 AS BIGINT) AS n_lines,
           CAST(COALESCE(p.lines_removed, 0) AS BIGINT) AS lines_removed,
           CAST(COALESCE(p.tokens_removed, 0) AS BIGINT) AS tokens_removed
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", text_fns.tokens(F.col("text")).alias("t")
    )
    lines = base.select(
        "doc_id",
        F.size("t").alias("nt"),
        F.posexplode(gopher_fns.token_windows(F.col("t"), 8)).alias(
            "idx", "line"
        ),
    )
    canon = (
        lines.groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("doc_id", "idx")).alias("first_occ"),
        )
        .filter(F.col("c") >= 2)
    )
    dups = (
        lines.join(canon, "line")
        .filter(
            (F.col("doc_id") != F.col("first_occ.doc_id"))
            | (F.col("idx") != F.col("first_occ.idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("lines_removed"),
            F.sum(F.least(F.lit(8), F.col("nt") - 8 * F.col("idx"))).alias(
                "tokens_removed"
            ),
        )
    )
    return (
        base.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.floor((F.size("t") + 7) / 8).cast("long").alias("n_lines"),
            F.coalesce(F.col("lines_removed"), F.lit(0))
            .cast("long")
            .alias("lines_removed"),
            F.coalesce(F.col("tokens_removed"), F.lit(0))
            .cast("long")
            .alias("tokens_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Levene's variance-homogeneity test across segments (mean-centered
# form): W = ((N−k)/(k−1)) · Σ nᵢ(z̄ᵢ−z̄)² / ΣΣ(zᵢⱼ−z̄ᵢ)².
# Exactness ladder: per-row |x−meanᵢ| is micros-quantized BEFORE any
# sum; the per-segment between/within terms are unit-quantized before
# the k-row closing sum (partition-order float drift cannot reach the
# artifact); W closes in one double expression.
# ---------------------------------------------------------------------------
@register(
    "q_levene",
    """
    WITH j AS (
      SELECT c_mktsegment AS seg,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (SELECT seg, COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s
          FROM j GROUP BY seg),
    z AS (
      SELECT j.seg, g.n,
             CAST(FLOOR(abs(CAST(j.x AS DOUBLE)
                            - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS zq
      FROM j JOIN g USING (seg)
    ),
    gz AS (
      SELECT seg, n, SUM(CAST(zq AS HUGEINT)) AS sz,
             SUM(CAST(zq AS HUGEINT) * zq) AS szz
      FROM z GROUP BY seg, n
    ),
    tot AS (
      SELECT SUM(sz) AS tz, SUM(CAST(n AS HUGEINT)) AS tn,
             COUNT(*) AS k
      FROM gz
    ),
    terms AS (
      SELECT CAST(round(CAST(n AS DOUBLE)
               * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(tot.tz AS DOUBLE) / CAST(tot.tn AS DOUBLE))
               * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(tot.tz AS DOUBLE) / CAST(tot.tn AS DOUBLE)))
               AS HUGEINT) AS bterm,
             CAST(round(CAST(szz AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
               AS HUGEINT) AS wterm,
             tot.tn, tot.k
      FROM gz CROSS JOIN tot
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(tn AS BIGINT) AS n_total,
           CAST(FLOOR(
             (CAST(tn AS DOUBLE) - CAST(k AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0)
             * CAST(SUM(bterm) AS DOUBLE) / CAST(SUM(wterm) AS DOUBLE)
             * 1000000 + 0.5) AS BIGINT) AS levene_micros
    FROM terms GROUP BY k, tn
    """,
)
def q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    dec = "decimal(38,0)"
    j = join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("seg"), cents.alias("x")
    )
    g = j.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("x").cast(dec)).alias("s")
    )
    zq = F.floor(
        F.abs(
            F.col("x").cast("double")
            - F.col("s").cast("double") / F.col("n").cast("double")
        )
        * 1_000_000
        + 0.5
    ).cast("long")
    z = j.join(F.broadcast(g), "seg").select("seg", "n", zq.alias("zq"))
    gz = z.groupBy("seg", "n").agg(
        F.sum(F.col("zq").cast(dec)).alias("sz"),
        F.sum(F.col("zq").cast(dec) * F.col("zq")).alias("szz"),
    )
    tot = gz.agg(
        F.sum("sz").alias("tz"),
        F.sum(F.col("n").cast(dec)).alias("tn"),
        F.count(F.lit(1)).alias("k"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    zbar_diff = d("sz") / d("n") - d("tz") / d("tn")
    # NOTE: floor() on double returns LONG in Spark and silently
    # saturates near 9.2e18; these terms reach ~1e30, so quantize via
    # round()->decimal (round(double) is half-up in both engines and
    # the fractional part is exactly representable either way)
    terms = gz.crossJoin(F.broadcast(tot)).select(
        F.round(d("n") * zbar_diff * zbar_diff).cast(dec).alias("bterm"),
        F.round(d("szz") - d("sz") * d("sz") / d("n")).cast(dec).alias("wterm"),
        F.col("tn"),
        F.col("k"),
    )
    return (
        terms.groupBy("k", "tn")
        .agg(
            F.floor(
                (F.col("tn").cast("double") - F.col("k").cast("double"))
                / (F.col("k").cast("double") - 1.0)
                * F.sum("bterm").cast("double")
                / F.sum("wterm").cast("double")
                * 1_000_000
                + 0.5
            )
            .cast("long")
            .alias("levene_micros")
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("tn").cast("long").alias("n_total"),
            "levene_micros",
        )
    )


# ---------------------------------------------------------------------------
# Cramér's V association strength for the priority × segment
# contingency table — the normalized companion of q_chi_square
# (same per-cell micros-quantized chi² sum), closed as
# V = sqrt(chi² / (n · min(r−1, c−1))) in one double expression.
# ---------------------------------------------------------------------------
@register(
    "q_cramers_v",
    """
    WITH joined AS (
      SELECT o_orderpriority AS a, c_mktsegment AS b
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cells AS (SELECT a, b, COUNT(*) AS n_ab FROM joined GROUP BY a, b),
    m AS (
      SELECT a, b, n_ab,
             SUM(n_ab) OVER (PARTITION BY a) AS n_a,
             SUM(n_ab) OVER (PARTITION BY b) AS n_b,
             SUM(n_ab) OVER () AS n
      FROM cells
    ),
    s AS (
      SELECT SUM(CAST(FLOOR(
               (CAST(n_ab AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n_ab AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS chi2_micros,
             COUNT(DISTINCT a) AS r,
             COUNT(DISTINCT b) AS c,
             MAX(n) AS n
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r AS BIGINT) AS r,
           CAST(c AS BIGINT) AS c,
           CAST(chi2_micros AS BIGINT) AS chi2_micros,
           CAST(FLOOR(sqrt(CAST(chi2_micros AS DOUBLE) / 1000000.0
             / (CAST(n AS DOUBLE)
                * CAST(least(r - 1, c - 1) AS DOUBLE)))
             * 1000000 + 0.5) AS BIGINT) AS v_micros
    FROM s
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        join_ops.dim_join(o, c, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("o_orderpriority").alias("a"), F.col("c_mktsegment").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    m = (
        cells.withColumn("n_a", F.sum("n_ab").over(Window.partitionBy("a")))
        .withColumn("n_b", F.sum("n_ab").over(Window.partitionBy("b")))
        .withColumn("n", F.sum("n_ab").over(Window.partitionBy()))
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    exp = d("n_a") * d("n_b") / d("n")
    cell_term = F.floor(
        (d("n_ab") - exp) * (d("n_ab") - exp) / exp * 1_000_000 + 0.5
    ).cast("long")
    s = m.agg(
        F.sum(cell_term).alias("chi2_micros"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        F.max("n").alias("n"),
    )
    v = F.floor(
        F.sqrt(
            F.col("chi2_micros").cast("double")
            / 1_000_000.0
            / (
                F.col("n").cast("double")
                * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
            )
        )
        * 1_000_000
        + 0.5
    ).cast("long")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.col("chi2_micros").cast("long").alias("chi2_micros"),
        v.alias("v_micros"),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence of each source's unigram distribution vs
# the corpus — the bounded, symmetric companion to q_kl_source (JS is
# finite even for terms a source never emits, which is why the grid
# is sources × FULL vocabulary: the p_c·ln(p_c/m) leg runs over every
# term). Per-term contributions nano-quantized before the sum.
# ---------------------------------------------------------------------------
@register(
    "q_js_source",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS_SQL}) AS term FROM documents
    ), st AS (
      SELECT source, term, COUNT(*) AS n FROM tok
      WHERE term <> '' GROUP BY source, term
    ), ct AS (
      SELECT term, SUM(n) AS ct FROM st GROUP BY term
    ), stot AS (
      SELECT source, SUM(n) AS ns FROM st GROUP BY source
    ), tot AS (SELECT SUM(n) AS nc FROM st),
    grid AS (
      SELECT stot.source, stot.ns, ct.term, ct.ct, tot.nc,
             COALESCE(st.n, 0) AS n
      FROM stot CROSS JOIN ct CROSS JOIN tot
      LEFT JOIN st ON st.source = stot.source AND st.term = ct.term
    )
    SELECT source,
           CAST(ns AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR((
             0.5 * (CASE WHEN n = 0 THEN 0.0 ELSE
               (n * 1.0 / ns) * ln((n * 1.0 / ns)
                 / (((n * 1.0 / ns) + (ct * 1.0 / nc)) / 2.0)) END)
             + 0.5 * ((ct * 1.0 / nc) * ln((ct * 1.0 / nc)
                 / (((n * 1.0 / ns) + (ct * 1.0 / nc)) / 2.0)))
           ) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS js_nanos_sum
    FROM grid GROUP BY source, ns
    """,
)
def q_js_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    st = (
        docs.select(
            "source", F.explode(text_fns.tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ct = st.groupBy("term").agg(F.sum("n").alias("ct"))
    stot = st.groupBy("source").agg(F.sum("n").alias("ns"))
    tot = st.agg(F.sum("n").alias("nc"))
    grid = (
        ct.crossJoin(F.broadcast(stot))
        .crossJoin(F.broadcast(tot))
        .join(st, ["source", "term"], "left")
        .select(
            "source", "ns", "ct", "nc", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    ps = F.col("n") * 1.0 / F.col("ns")
    pc = F.col("ct") * 1.0 / F.col("nc")
    m = (ps + pc) / 2.0
    term_nanos = F.floor(
        (
            0.5
            * F.when(F.col("n") == 0, F.lit(0.0)).otherwise(ps * F.log(ps / m))
            + 0.5 * (pc * F.log(pc / m))
        )
        * 1_000_000_000
        + 0.5
    ).cast("long")
    return (
        grid.groupBy("source", "ns")
        .agg(F.sum(term_nanos).alias("js_nanos_sum"))
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens"),
            F.col("js_nanos_sum").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Gini coefficient of the corpus token-frequency distribution — the
# single-number inequality summary beside q_zipf's slope and
# q_heaps' growth law. Identical machinery to q_gini_revenue: the
# vocabulary relation ranks by (count, term) through the STAGED
# two-phase rank, and Gini closes from exact integer sums (rank ×
# count stays far inside int64 at vocabulary sizes).
# ---------------------------------------------------------------------------
@register(
    "q_gini_tokens",
    f"""
    WITH freq AS (
      SELECT term, COUNT(*) AS cnt FROM (
        SELECT unnest({_TOKENS_SQL}) AS term FROM documents
      ) WHERE term <> '' GROUP BY term
    ),
    ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt, term) AS rn,
             COUNT(*) OVER () AS n
      FROM freq
    )
    SELECT CAST(SUM(rn * cnt) AS BIGINT) AS weighted_sum,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           MAX(n) AS n_types,
           2.0 * CAST(SUM(rn * cnt) AS DOUBLE)
             / (MAX(n) * CAST(SUM(cnt) AS DOUBLE))
             - CAST(MAX(n) + 1 AS DOUBLE) / MAX(n) AS gini
    FROM ranked
    """,
)
def q_gini_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    freq = (
        docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = grouped_rank(
        freq, [], ["cnt", "term"], rank_col="rn", count_col="n", stage=True
    )
    ws = F.sum(F.col("rn") * F.col("cnt"))
    tot = F.sum("cnt")
    n = F.max("n")
    return ranked.agg(
        ws.cast("long").alias("weighted_sum"),
        tot.cast("long").alias("total_tokens"),
        n.alias("n_types"),
        (
            2.0 * ws.cast("double") / (n * tot.cast("double"))
            - (n + 1).cast("double") / n
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch over the corpus token stream
# (operators/sketches.py count_min_*): estimates for the 20 most
# frequent tokens read back from a 4×256 sketch, beside their true
# counts. Because the CMS hashes with the portable md5 hash60, the
# oracle rebuilds the ENTIRE sketch and every estimate bit-for-bit —
# a sketch query with a full value check (HLL's opaque bytes cannot
# do this). est − true exhibits the one-sided overestimate guarantee.
# ---------------------------------------------------------------------------
@register(
    "q_cms_tokens",
    f"""
    WITH tok AS (
      SELECT term FROM (
        SELECT unnest({_TOKENS_SQL}) AS term FROM documents
      ) WHERE term <> ''
    ),
    cnt AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 20),
    buckets AS (
      SELECT j AS row,
             {hash60_sql("term", seed="cms'||j||'")} % 256 AS col,
             COUNT(*) AS c
      FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT term, n, j AS row,
             {hash60_sql("term", seed="cms'||j||'")} % 256 AS col
      FROM top CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
    )
    SELECT p.term,
           CAST(p.n AS BIGINT) AS true_n,
           CAST(MIN(COALESCE(b.c, 0)) AS BIGINT) AS est_n,
           CAST(MIN(COALESCE(b.c, 0)) - p.n AS BIGINT) AS overestimate
    FROM probes p LEFT JOIN buckets b USING (row, col)
    GROUP BY p.term, p.n
    """,
)
def q_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(text_fns.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    top = cnt.orderBy(F.desc("n"), "term").limit(20)
    sketch = count_min_build(tok, "term", depth=4, width=256)
    est = count_min_estimate(sketch, top, "term", depth=4, width=256)
    return (
        top.join(est, top.term == est.key)
        .select(
            "term",
            F.col("n").cast("long").alias("true_n"),
            F.col("est").cast("long").alias("est_n"),
            (F.col("est") - F.col("n")).cast("long").alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Stationary distribution of the user-event Markov chain — the
# long-run share of time the event process spends in each state,
# closing the q_transitions / q_cond_entropy / q_entropy_rate family.
# Iterative power method, but with EXACT integer fixed-point algebra:
# the state vector lives in nanos, every per-edge term is the integer
# rounding division (v_i·n_ij + t_i/2) DIV t_i, and each of the 30
# iterations sums exact integers — so this ITERATIVE query carries a
# FULL value oracle (30 unrolled CTEs), where float iteration
# (PageRank) is rows-only by necessity. The transition matrix is
# domain-bounded (k event types), so Spark iterates the k-vector on
# the driver after ONE distributed aggregation of the fact table.
# ---------------------------------------------------------------------------
_MARKOV_ITERS = 30


def _markov_iter_ctes(n: int) -> str:
    parts = []
    for i in range(n):
        parts.append(f""",
    v{i + 1} AS MATERIALIZED (
      SELECT c.nxt AS state,
             CAST(SUM((v.v * c.n + ct.t // 2) // ct.t) AS BIGINT) AS v
      FROM v{i} v JOIN cnt c ON v.state = c.cur JOIN ct ON c.cur = ct.cur
      GROUP BY c.nxt
    )""")
    return "".join(parts)


@register(
    "q_markov_stationary",
    f"""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS MATERIALIZED (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    ct AS MATERIALIZED (SELECT cur, SUM(n) AS t FROM cnt GROUP BY cur),
    v0 AS MATERIALIZED (
      SELECT cur AS state,
             CAST(1000000000 // (SELECT COUNT(*) FROM ct) AS BIGINT) AS v
      FROM ct
    ){_markov_iter_ctes(_MARKOV_ITERS)}
    SELECT state, CAST(v AS BIGINT) AS stationary_nanos
    FROM v{_MARKOV_ITERS}
    """,
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the matrix is domain-bounded (k event types, k^2 cells) —
    # driver-sized by construction, like the PQ codebooks
    edges = cnt.collect()
    totals: dict[str, int] = {}
    for r in edges:
        totals[r.cur] = totals.get(r.cur, 0) + r.n
    k = len(totals)
    v = {s: 1_000_000_000 // k for s in totals}
    # each iteration mirrors the oracle CTE EXACTLY, row set included:
    # v_{i+1} = GROUP BY c.nxt over edges whose cur is in v_i — so
    # absorbing states (nxt-only) appear with their inbound mass, and
    # cur-states with no inbound edge drop out; on a chain that is not
    # closed over its cur-set the two engines still return the same
    # rows (the prior cur-set restriction diverged there).
    for _ in range(_MARKOV_ITERS):
        nv: dict[str, int] = {}
        for r in edges:
            if r.cur in v:
                t = totals[r.cur]
                nv[r.nxt] = nv.get(r.nxt, 0) + (v[r.cur] * r.n + t // 2) // t
        v = nv
    return spark.createDataFrame(
        [(s, v[s]) for s in sorted(v)], "state string, stationary_nanos long"
    )


# ---------------------------------------------------------------------------
# Composite quality score bands — the single number a curriculum /
# sampling policy sorts by, folding language, length, and punctuation
# into one micros integer per doc (40% language, 30% length saturated
# at 30 tokens, 30% cleanliness with punct ratio saturating at 0.2).
# All integer rounding divisions after one per-doc quantization of
# the punct ratio; output is the per-band histogram a curator reads.
# ---------------------------------------------------------------------------
@register(
    "q_quality_score",
    f"""
    WITH base AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS ntok,
             CAST(FLOOR(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) * 1000000 + 0.5) AS BIGINT) AS pm,
             lang
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(CASE WHEN lang = 'en' THEN 400000 ELSE 0 END
               + (300000 * least(ntok, 30) + 15) // 30
               + (300000 * (1000000 - least(pm * 5, 1000000)) + 500000)
                 // 1000000 AS BIGINT) AS score
      FROM base
    )
    SELECT CAST(score // 100000 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM scored GROUP BY 1
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pm = F.floor(text_fns.punct_ratio(F.col("text")) * 1_000_000 + 0.5).cast(
        "long"
    )
    base = docs.select(
        "doc_id",
        text_fns.n_tokens(F.col("text")).alias("ntok"),
        pm.alias("pm"),
        "lang",
    )
    score = (
        F.when(F.col("lang") == "en", F.lit(400000)).otherwise(F.lit(0))
        + F.expr("(300000 * least(ntok, 30) + 15) DIV 30")
        + F.expr(
            "(300000 * (1000000 - least(pm * 5, 1000000)) + 500000)"
            " DIV 1000000"
        )
    ).cast("long")
    scored = base.select("doc_id", score.alias("score"))
    return scored.groupBy(
        F.expr("score DIV 100000").cast("long").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# LIX readability per source: words/sentences + 100·longwords/words,
# with "sentences" the fixed 8-token windows of the newline-free
# corpus (same convention as the Gopher battery) and long words > 6
# chars. Per-doc LIX micros by integer rounding division; per-source
# mean by a second rounding division. Pure scan + one aggregation.
# ---------------------------------------------------------------------------
@register(
    "q_lix",
    f"""
    WITH base AS (
      SELECT source,
             len({_TOKENS_SQL}) AS ntok,
             len(list_filter({_TOKENS_SQL}, t -> length(t) > 6)) AS nlong
      FROM documents
    ),
    per_doc AS (
      SELECT source,
             (ntok * 1000000 + ((ntok + 7) // 8) // 2) // ((ntok + 7) // 8)
             + (100 * nlong * 1000000 + ntok // 2) // ntok AS lix
      FROM base WHERE ntok > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((SUM(lix) + COUNT(*) // 2) // COUNT(*) AS BIGINT)
             AS mean_lix_micros
    FROM per_doc GROUP BY source
    """,
)
def q_lix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = text_fns.tokens(F.col("text"))
    base = docs.select(
        "source",
        F.size(toks).alias("ntok"),
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).alias("nlong"),
    ).filter(F.col("ntok") > 0)
    per_doc = base.select(
        "source",
        F.expr(
            "(ntok * 1000000 + ((ntok + 7) DIV 8) DIV 2) DIV ((ntok + 7) DIV 8)"
            " + (100 * nlong * 1000000 + ntok DIV 2) DIV ntok"
        ).alias("lix"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            "CAST((SUM(lix) + COUNT(1) DIV 2) DIV COUNT(1) AS BIGINT)"
        ).alias("mean_lix_micros"),
    )


# ---------------------------------------------------------------------------
# Dedup-rate threshold curve: how many near-dup pairs (and distinct
# dropped docs) each Jaccard threshold would remove — the sweep a
# curator runs BEFORE fixing a threshold. ONE pair relation (the
# posting-list jaccard machinery, lineage once) feeds every
# threshold row; integer 10·j >= t gates, no float comparisons.
# ---------------------------------------------------------------------------
@register(
    "q_dedup_curve",
    f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    shingled0 AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM corpus")}),
    rare AS (
      SELECT shingle FROM shingled0 GROUP BY shingle
      HAVING COUNT(*) <= {_SHINGLE_MAX_DF}
    ),
    shingled AS (SELECT s.* FROM shingled0 s JOIN rare USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM shingled GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
      FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b, n_common,
             sa.n_shingles + sb.n_shingles - n_common AS n_union
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc
      JOIN sizes sb ON doc_b = sb.doc
    ),
    ts(t) AS (VALUES (5), (6), (7), (8), (9))
    SELECT CAST(ts.t AS BIGINT) AS threshold_tenths,
           CAST(COUNT(CASE WHEN 10 * n_common >= ts.t * n_union THEN 1 END)
                AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN 10 * n_common >= ts.t * n_union
                                    THEN doc_b END) AS BIGINT)
             AS n_docs_dropped
    FROM pairs CROSS JOIN ts
    GROUP BY ts.t
    """,
)
def q_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = _with_near_copies(docs)
    # the library's guarded posting-list tier (stop-shingle guard
    # BEFORE pair generation, mirrored in the oracle's rare CTE;
    # sizes computed over the guarded index on both sides) — ONE pair
    # relation feeds every threshold row
    pairs = jac_ops.jaccard_pair_counts(
        corpus, "doc_id", "text", 3, max_df=_SHINGLE_MAX_DF
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        (F.col("size_a") + F.col("size_b") - F.col("n_common")).alias("n_union"),
    )
    ts = spark.range(5, 10).select(F.col("id").alias("t"))
    hit = 10 * F.col("n_common") >= F.col("t") * F.col("n_union")
    return (
        pairs.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.count(F.when(hit, 1)).cast("long").alias("n_pairs"),
            F.countDistinct(F.when(hit, F.col("doc_b")))
            .cast("long")
            .alias("n_docs_dropped"),
        )
        .select(F.col("t").cast("long").alias("threshold_tenths"), "n_pairs", "n_docs_dropped")
    )


# ---------------------------------------------------------------------------
# Pairwise source overlap: shingle-set Jaccard between every source
# pair — the contamination / mirror detector ACROSS ingest feeds
# (q_source_jaccard's idea generalized from one pair to the full
# source × source profile). Posting lists over sources are bounded
# by the source count, so the in-array i<j expansion is structurally
# tiny — no hot-key risk at any corpus size.
# ---------------------------------------------------------------------------
@register(
    "q_source_overlap",
    f"""
    WITH sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (SELECT source, {_TOKENS_SQL} AS toks FROM documents)
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST((n_common * 1000000
                 + (sa.n + sb.n - n_common) // 2)
                // (sa.n + sb.n - n_common) AS BIGINT) AS jaccard_micros
    FROM inter
    JOIN sizes sa ON src_a = sa.source
    JOIN sizes sb ON src_b = sb.source
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.hashing import shingles

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "source",
        F.explode(shingles(text_fns.tokens(F.col("text")), 3)).alias(
            "shingle"
        ),
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    postings = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> struct(x AS src_a, y AS src_b))))"
    )
    inter = (
        postings.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                "CAST((n_common * 1000000 + (na + nb - n_common) DIV 2)"
                " DIV (na + nb - n_common) AS BIGINT)"
            ).alias("jaccard_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget mixture sampling: take documents per source in
# deterministic md5 order until each source's token budget is
# reached — the SELECTION step that materializes q_mixture_weights'
# plan (which only computes targets). The cumulative token count
# rides the staged two-phase grouped prefix sum (never a fact-wide
# window); the keep rule is "cumsum - own tokens < budget" so the
# budget-crossing doc is included (every source reaches its budget).
# Layout-invariant: md5 order, not ingestion order.
# ---------------------------------------------------------------------------
_TB_BUDGET = 2000  # tokens per source


@register(
    "q_token_budget_sample",
    f"""
    WITH base AS (
      SELECT source, doc_id,
             len({_TOKENS_SQL}) AS ntok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, ntok,
             SUM(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM base
    ),
    kept AS (
      SELECT source, doc_id, ntok, cum
      FROM ranked WHERE cum - ntok < {_TB_BUDGET}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(MAX(cum) AS BIGINT) AS final_cum
    FROM kept GROUP BY source
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "source",
        "doc_id",
        text_fns.n_tokens(F.col("text")).cast("long").alias("ntok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    ranked = grouped_prefix_sum(
        base, ["source"], ["h", "doc_id"], "ntok", cum_col="cum"
    )
    kept = ranked.filter(F.col("cum") - F.col("ntok") < _TB_BUDGET)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.max("cum").cast("long").alias("final_cum"),
    )


# ---------------------------------------------------------------------------
# Training-shard assignment balance: documents land in shards by
# content hash (pmod(md5-hash, n)), the deterministic global shuffle
# every training run needs (layout/ingestion-order invariant,
# reproducible across re-runs). The query audits what the
# write_training_shards sink would produce: per-shard doc/token
# counts and the min/max spread that tells a trainer its worst-case
# shard skew.
# ---------------------------------------------------------------------------
_N_SHARDS = 16


@register(
    "q_shard_balance",
    f"""
    WITH assigned AS (
      SELECT {hash60_sql("CAST(doc_id AS VARCHAR)", seed="shard")} % {_N_SHARDS}
               AS shard,
             len({_TOKENS_SQL}) AS ntok
      FROM documents
    ),
    per AS (
      SELECT shard, COUNT(*) AS n_docs, SUM(ntok) AS n_tokens
      FROM assigned GROUP BY shard
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((SELECT MIN(n_tokens) FROM per) AS BIGINT) AS min_shard_tokens,
           CAST((SELECT MAX(n_tokens) FROM per) AS BIGINT) AS max_shard_tokens
    FROM per
    """,
)
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.hashing import hash60

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    assigned = docs.select(
        F.pmod(
            hash60(F.col("doc_id").cast("string"), seed="shard"), _N_SHARDS
        ).alias("shard"),
        text_fns.n_tokens(F.col("text")).cast("long").alias("ntok"),
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").alias("n_tokens")
    )
    ext = per.agg(
        F.min("n_tokens").alias("mn"), F.max("n_tokens").alias("mx")
    )
    return per.crossJoin(F.broadcast(ext)).select(
        F.col("shard").cast("long").alias("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("mn").cast("long").alias("min_shard_tokens"),
        F.col("mx").cast("long").alias("max_shard_tokens"),
    )


# ---------------------------------------------------------------------------
# Context-window packing efficiency: for each candidate window size,
# how many packed sequences the corpus yields and what fraction of
# their token capacity is real text vs padding waste — the number
# that decides a training run's window size. Greedy concatenation in
# deterministic doc order per source (q_pack_docs' convention):
# sequences per source = ceil(source_tokens / W), waste = capacity −
# tokens. Integer arithmetic end to end.
# ---------------------------------------------------------------------------
@register(
    "q_packing_stats",
    f"""
    WITH per_source AS (
      SELECT source, SUM(len({_TOKENS_SQL})) AS ntok FROM documents
      GROUP BY source
    ),
    ws(w) AS (VALUES (1024), (2048), (4096), (8192)),
    packed AS (
      SELECT ws.w, source, ntok, (ntok + ws.w - 1) // ws.w AS n_seqs
      FROM per_source CROSS JOIN ws
    )
    SELECT CAST(w AS BIGINT) AS window_size,
           CAST(SUM(n_seqs) AS BIGINT) AS n_sequences,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_seqs) * w - SUM(ntok) AS BIGINT) AS padding_tokens,
           CAST((SUM(ntok) * 1000000 + (SUM(n_seqs) * w) // 2)
                // (SUM(n_seqs) * w) AS BIGINT) AS fill_micros
    FROM packed GROUP BY w
    """,
)
def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    per_source = docs.groupBy("source").agg(
        F.sum(text_fns.n_tokens(F.col("text")).cast("long")).alias("ntok")
    )
    ws = spark.createDataFrame(
        [(1024,), (2048,), (4096,), (8192,)], "w long"
    )
    packed = per_source.crossJoin(F.broadcast(ws)).select(
        "w", "ntok", F.expr("(ntok + w - 1) DIV w").alias("n_seqs")
    )
    return (
        packed.groupBy("w")
        .agg(
            F.sum("n_seqs").alias("n_seqs"),
            F.sum("ntok").alias("ntok"),
        )
        .select(
            F.col("w").cast("long").alias("window_size"),
            F.col("n_seqs").cast("long").alias("n_sequences"),
            F.col("ntok").cast("long").alias("n_tokens"),
            (F.col("n_seqs") * F.col("w") - F.col("ntok"))
            .cast("long")
            .alias("padding_tokens"),
            F.expr(
                "CAST((ntok * 1000000 + (n_seqs * w) DIV 2)"
                " DIV (n_seqs * w) AS BIGINT)"
            ).alias("fill_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Context-length fit profile: how much of the corpus (docs and
# tokens) fits whole into each candidate context window — the
# companion decision input to q_packing_stats for pipelines that
# truncate instead of pack. One scan, broadcast window list.
# ---------------------------------------------------------------------------
@register(
    "q_context_fit",
    f"""
    WITH base AS (
      SELECT len({_TOKENS_SQL}) AS ntok FROM documents
    ),
    ws(w) AS (VALUES (64), (128), (256), (512)),
    tot AS (SELECT COUNT(*) AS nd, SUM(ntok) AS nt FROM base)
    SELECT CAST(ws.w AS BIGINT) AS window_size,
           CAST(COUNT(CASE WHEN ntok <= ws.w THEN 1 END) AS BIGINT)
             AS docs_fitting,
           CAST(tot.nd AS BIGINT) AS n_docs,
           CAST(SUM(least(ntok, ws.w)) AS BIGINT) AS tokens_kept,
           CAST(tot.nt - SUM(least(ntok, ws.w)) AS BIGINT)
             AS tokens_truncated
    FROM base CROSS JOIN ws CROSS JOIN tot
    GROUP BY ws.w, tot.nd, tot.nt
    """,
)
def q_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(text_fns.n_tokens(F.col("text")).cast("long").alias("ntok"))
    ws = spark.createDataFrame([(64,), (128,), (256,), (512,)], "w long")
    tot = base.agg(F.count(F.lit(1)).alias("nd"), F.sum("ntok").alias("nt"))
    return (
        base.crossJoin(F.broadcast(ws))
        .crossJoin(F.broadcast(tot))
        .groupBy("w", "nd", "nt")
        .agg(
            F.count(F.when(F.col("ntok") <= F.col("w"), 1)).alias("fit"),
            F.sum(F.least(F.col("ntok"), F.col("w"))).alias("kept"),
        )
        .select(
            F.col("w").cast("long").alias("window_size"),
            F.col("fit").cast("long").alias("docs_fitting"),
            F.col("nd").cast("long").alias("n_docs"),
            F.col("kept").cast("long").alias("tokens_kept"),
            (F.col("nt") - F.col("kept")).cast("long").alias("tokens_truncated"),
        )
    )


# ---------------------------------------------------------------------------
# Versioned-table witnesses: the newest source surface
# (sources/versioned.py — snapshot isolation + time travel) put under
# the same hard oracle gate as every other component. Both queries
# PLANT a deterministic three-version table from `orders` inside a
# fresh temp dir (v1 = base slice; v2 = upsert: re-priced %5 keys +
# added %7 keys shifted by 1e8; v3 = direct snapshot write deleting
# %11 keys), then read historical versions AFTER later versions are
# published — the time-travel property itself is what produces the
# answer. The oracle rebuilds v1/v2/v3 purely relationally. Prices go
# through the _micros integer hand-off at v1-construction time so
# every later version is integer-exact on both engines.
# ---------------------------------------------------------------------------
_VT_V1_SQL = """
    SELECT o_orderkey, o_custkey,
           CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT) AS price_micros
    FROM orders WHERE o_orderkey % 13 = 0
"""
_VT_UPD_SQL = """
    SELECT o_orderkey, o_custkey, price_micros + 1000000 AS price_micros
    FROM v1 WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, price_micros
    FROM v1 WHERE o_orderkey % 7 = 0
"""
_VT_CTES = f"""
    WITH v1 AS ({_VT_V1_SQL}),
    upd AS ({_VT_UPD_SQL}),
    v2 AS (
      SELECT * FROM v1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL SELECT * FROM upd
    ),
    v3 AS (SELECT * FROM v2 WHERE o_orderkey % 11 <> 0)
"""


def _planted_versioned_table(spark: SparkSession, sf_dir: str) -> str:
    """Write the deterministic v1/v2/v3 ladder and return the table
    dir (a fresh mkdtemp per call — snapshots are immutable, so two
    concurrent invocations never interfere). The driver-local temp
    path is the single-node TEST WITNESS harness; the versioned-table
    API itself is scheme-agnostic (Hadoop FS), so the same ladder
    runs against hdfs:// / s3a:// table dirs on a cluster."""
    import tempfile

    from frames_spark.sources.versioned import (
        read_versioned,
        upsert_versioned,
        write_versioned,
    )

    table_dir = tempfile.mkdtemp(prefix="fs_vtbl_")
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            _micros(F.col("o_totalprice")).alias("price_micros"),
        )
    )
    write_versioned(base, table_dir)  # v1
    updates = (
        base.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("price_micros") + 1_000_000).alias("price_micros"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 7 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_custkey",
                "price_micros",
            )
        )
    )
    upsert_versioned(spark, table_dir, updates, ["o_orderkey"])  # v2
    v3 = read_versioned(spark, table_dir, version=2).filter(
        F.col("o_orderkey") % 11 != 0
    )
    write_versioned(v3, table_dir)  # v3 (delete-as-snapshot)
    return table_dir


@register(
    "q_time_travel",
    _VT_CTES + """
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_micros) AS BIGINT) AS sum_price_micros,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM v1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(price_micros) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
    FROM v2
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(price_micros) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
    FROM v3
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.sources.versioned import read_versioned

    table_dir = _planted_versioned_table(spark, sf_dir)
    # every historical version is read AFTER v3 is published — the
    # snapshot-isolation/time-travel property under test
    per_version = [
        read_versioned(spark, table_dir, version=v).agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_micros").cast("long").alias("sum_price_micros"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        for v in (1, 2, 3)
    ]
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out.select("version", "n_rows", "sum_price_micros", "max_key")


@register(
    "q_snapshot_diff",
    _VT_CTES + """
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.price_micros <> b.price_micros
                  OR a.o_custkey <> b.o_custkey THEN 'changed'
           END AS change
    FROM v1 a FULL OUTER JOIN v3 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.price_micros <> b.price_micros
       OR a.o_custkey <> b.o_custkey
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.sources.versioned import read_versioned

    table_dir = _planted_versioned_table(spark, sf_dir)
    # q_table_diff's machinery composed with time travel: diff the
    # oldest snapshot against the newest — 'added' (%7 keys), 'removed'
    # (%11 delete + upsert-displaced), 'changed' (%5 re-price) all
    # exercised in one result.
    return table_diff(
        read_versioned(spark, table_dir, version=1),
        read_versioned(spark, table_dir, version=3),
        ["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# Gopher Table A1 COMPLETION (the extended battery, Rae et al. 2021):
# duplicated-{5..10}-gram character fractions (ALL occurrences of any
# n-gram appearing twice or more), symbol-to-word ratio ('#', '…' and
# non-overlapping '...'), and bullet-start / ellipsis-end line
# fractions. Sibling of q_gopher_repetition: together they cover the
# full table, and passes_repetition_gates enforces every threshold.
# Spark side is still pure scan expressions (the dup-gram count is
# the same sorted-run fold, banking finished runs); oracle recomputes
# relationally per n with identical rounding divisions.
# ---------------------------------------------------------------------------
_GFULL_GRAMS_SQL = " UNION ALL ".join(
    f"""SELECT doc_id, {n} AS n,
        unnest(CASE WHEN len(t) >= {n} THEN
          list_transform(range(1, len(t) - {n - 2}),
                         i -> array_to_string(t[i:i+{n - 1}], ' '))
          ELSE [] END) AS gram FROM base"""
    for n in range(5, 11)
)
_GFULL_DUP_COLS_SQL = ",\n             ".join(
    f"SUM(CASE WHEN n = {n} AND c >= 2 THEN c * length(gram) ELSE 0 END) AS d{n}"
    for n in range(5, 11)
)
_GFULL_FRAC_COLS_SQL = ",\n           ".join(
    f"""CASE WHEN w.tc > 0 THEN
             CAST((COALESCE(d.d{n}, 0) * 1000000 + w.tc // 2) // w.tc AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS dup_{n}gram_char_frac_micros"""
    for n in range(5, 11)
)


@register(
    "q_gopher_full",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKENS_SQL} AS t, length({_NORM_SQL}) AS tc
      FROM documents
    ),
    win AS (
      SELECT doc_id, tc, len(t) AS nw,
             list_transform(range(0, CAST((len(t) + 7) // 8 AS INT)),
                            i -> array_to_string(t[8*i+1 : 8*i+8], ' ')) AS ls
      FROM base
    ),
    g AS ({_GFULL_GRAMS_SQL}),
    cnt AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
    dup AS (
      SELECT doc_id,
             {_GFULL_DUP_COLS_SQL}
      FROM cnt GROUP BY doc_id
    ),
    sym AS (
      SELECT doc_id,
             SUM(length(tok) - length(replace(tok, '#', ''))
                 + length(tok) - length(replace(tok, '…', ''))
                 + (length(tok) - length(replace(tok, '...', ''))) // 3)
               AS syms
      FROM (SELECT doc_id, unnest(t) AS tok FROM base)
      GROUP BY doc_id
    )
    SELECT w.doc_id,
           {_GFULL_FRAC_COLS_SQL},
           CASE WHEN w.nw > 0 THEN
             CAST((COALESCE(s.syms, 0) * 1000000 + w.nw // 2) // w.nw AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS symbol_word_ratio_micros,
           CASE WHEN len(w.ls) > 0 THEN
             CAST((len(list_filter(w.ls,
                    x -> substr(x, 1, 1) IN ('•', '‣', '▪', '◦', '-', '*')))
                   * 1000000 + len(w.ls) // 2) // len(w.ls) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS bullet_line_frac_micros,
           CASE WHEN len(w.ls) > 0 THEN
             CAST((len(list_filter(w.ls,
                    x -> ends_with(x, '...') OR ends_with(x, '…')))
                   * 1000000 + len(w.ls) // 2) // len(w.ls) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS ellipsis_line_frac_micros
    FROM win w
    LEFT JOIN dup d USING (doc_id)
    LEFT JOIN sym s USING (doc_id)
    """,
)
def q_gopher_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pre = docs.select(
        "doc_id",
        text_fns.tokens(F.col("text")).alias("_toks"),
        F.length(text_fns.normalize(F.col("text"))).cast("long").alias("_tc"),
    )
    sig = gopher_fns.repetition_signals(
        F.col("_toks"), F.col("_tc"), extended=True
    )
    new_keys = [
        *[f"dup_{n}gram_char_frac_micros" for n in range(5, 11)],
        "symbol_word_ratio_micros",
        "bullet_line_frac_micros",
        "ellipsis_line_frac_micros",
    ]
    return pre.select("doc_id", *[sig[k].alias(k) for k in new_keys])


# ---------------------------------------------------------------------------
# Incremental dedup through the PERSISTED band-bucket index
# (dedup/index.py): the daily-crawl shape — batch 1 (the originals)
# builds the index, batch 2 (the planted near-copies) probes it for
# candidates and appends. The union of the two probes must equal the
# full one-shot recompute, so the oracle is EXACTLY q_dedup_minhash's
# SQL over the same planted corpus — the invariant itself is what the
# correctness gate checks. Index storage is a versioned parquet table
# in a fresh temp dir per call.
# ---------------------------------------------------------------------------
@register("q_incremental_dedup", _MINHASH_PAIRS_SQL)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from frames_spark.dedup.index import probe_and_append

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    b1 = corpus.filter(F.col("doc_id") < 1_000_000)
    b2 = corpus.filter(F.col("doc_id") >= 1_000_000)
    idx = tempfile.mkdtemp(prefix="fs_bandidx_")
    p1, _ = probe_and_append(
        spark, idx, b1, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    # p1 binds to the empty index and p2 to snapshot v=1 (versioned
    # reads pin their snapshot at call time), so the lazy union is
    # exact even though both evaluate after the second append
    p2, _ = probe_and_append(
        spark, idx, b2, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    return p1.unionByName(p2).distinct()


# ---------------------------------------------------------------------------
# LSH bucket-size profile: the skew audit for banded MinHash — bucket
# size distribution over the SAME banded index the dedup tiers (and
# the persisted cross-run index) probe. Bucket size is THE scale risk
# of LSH candidate generation (a size-s bucket expands to s(s-1)/2
# pairs), so this is the q_key_skew analog a curator runs before
# choosing band/row parameters or the max_bucket guard. One groupBy
# ladder, exact integers, full oracle over the shared signature CTEs.
# ---------------------------------------------------------------------------
@register(
    "q_lsh_bucket_stats",
    _MH_CTES + """
    , buckets AS (
      SELECT band, band_key, COUNT(*) AS sz
      FROM banded GROUP BY band, band_key
    )
    SELECT CAST(sz AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(sz) AS BIGINT) AS n_doc_slots,
           CAST(COUNT(*) * (sz * (sz - 1) // 2) AS BIGINT)
             AS candidate_pairs
    FROM buckets GROUP BY sz
    """,
)
def q_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.dedup.index import band_rows

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    banded = band_rows(
        corpus, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    buckets = banded.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return buckets.groupBy("sz").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("sz").cast("long").alias("n_doc_slots"),
        F.expr("CAST(COUNT(1) * (sz * (sz - 1) DIV 2) AS BIGINT)").alias(
            "candidate_pairs"
        ),
    ).select(
        F.col("sz").cast("long").alias("bucket_size"),
        "n_buckets",
        "n_doc_slots",
        "candidate_pairs",
    )


# ---------------------------------------------------------------------------
# Incremental duplicate CLUSTERS: the full daily-increment composition
# registered under the hard gate — batch 1 builds the persisted
# band-bucket index and clusters its own pairs; batch 2 probes,
# appends, and folds its pairs into the labels via update_components
# (star edges, cost bounded by the arriving batch). The oracle is
# EXACTLY q_dedup_clusters' recursive min-reachable-id CTE over the
# one-shot pair set: incremental labels == full reclustering is the
# invariant under test (the pytest twin proves it on subsets; this
# proves it against SQL on the whole planted corpus at both SFs).
# ---------------------------------------------------------------------------
@register(
    "q_incremental_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_MINHASH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """,
)
def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from frames_spark.dedup.index import probe_and_append

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    b1 = corpus.filter(F.col("doc_id") < 1_000_000)
    b2 = corpus.filter(F.col("doc_id") >= 1_000_000)
    idx = tempfile.mkdtemp(prefix="fs_bandidx_")
    p1, _ = probe_and_append(
        spark, idx, b1, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    labels = cluster_ops.connected_components(p1, "doc_a", "doc_b")
    p2, _ = probe_and_append(
        spark, idx, b2, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    return cluster_ops.update_components(labels, p2, "doc_a", "doc_b")


# Increment-layout twin of q_incremental_dedup: same invariant, same
# oracle (full one-shot recompute), but the index appends are O(batch)
# `inc=<key>/` partition dirs — the write path that holds at 100 TB.
@register("q_incremental_dedup_inc", _MINHASH_PAIRS_SQL)
def q_incremental_dedup_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from frames_spark.dedup.index import probe_increment

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    b1 = corpus.filter(F.col("doc_id") < 1_000_000)
    b2 = corpus.filter(F.col("doc_id") >= 1_000_000)
    idx = tempfile.mkdtemp(prefix="fs_incidx_")
    p1 = probe_increment(
        spark, idx, b1, "day-001", "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    p2 = probe_increment(
        spark, idx, b2, "day-002", "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, rows_per_band=_MH_ROWS,
    )
    return p1.unionByName(p2).distinct()


# ---------------------------------------------------------------------------
# Gopher gate IMPACT accounting: for every Table A1 rule, how many
# documents exceed its removal threshold — the decision table a
# curator reads before enabling the battery (q_dedup_curve's role,
# for quality gates). One per-doc signal relation (the union of
# q_gopher_repetition's and q_gopher_full's machinery) feeds all 14
# rules; rule rows are generated from the SAME GOPHER_THRESHOLDS dict
# on both engines so the thresholds cannot drift.
# ---------------------------------------------------------------------------
_GG_SIG_SQL = f"""
    base AS (
      SELECT doc_id, {_TOKENS_SQL} AS t, length({_NORM_SQL}) AS tc
      FROM documents
    ),
    win AS (
      SELECT doc_id, tc, len(t) AS nw,
             list_transform(range(0, CAST((len(t) + 7) // 8 AS INT)),
                            i -> array_to_string(t[8*i+1 : 8*i+8], ' ')) AS ls,
             list_transform(range(0, CAST((len(t) + 31) // 32 AS INT)),
                            i -> array_to_string(t[32*i+1 : 32*i+32], ' ')) AS ps
      FROM base
    ),
    gt AS (
      SELECT doc_id, 2 AS n,
             unnest(CASE WHEN len(t) >= 2 THEN
               list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
               ELSE [] END) AS gram FROM base
      UNION ALL
      SELECT doc_id, 3,
             unnest(CASE WHEN len(t) >= 3 THEN
               list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
               ELSE [] END) FROM base
      UNION ALL
      SELECT doc_id, 4,
             unnest(CASE WHEN len(t) >= 4 THEN
               list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))
               ELSE [] END) FROM base
    ),
    cnttop AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM gt GROUP BY 1, 2, 3),
    topg AS (
      SELECT doc_id, n, c, gram FROM (
        SELECT doc_id, n, c, gram,
               ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                  ORDER BY c DESC, gram ASC) AS rn
        FROM cnttop
      ) WHERE rn = 1
    ),
    gd AS ({_GFULL_GRAMS_SQL}),
    cntdup AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM gd GROUP BY 1, 2, 3),
    dup AS (
      SELECT doc_id,
             {_GFULL_DUP_COLS_SQL}
      FROM cntdup GROUP BY doc_id
    ),
    sym AS (
      SELECT doc_id,
             SUM(length(tok) - length(replace(tok, '#', ''))
                 + length(tok) - length(replace(tok, '…', ''))
                 + (length(tok) - length(replace(tok, '...', ''))) // 3)
               AS syms
      FROM (SELECT doc_id, unnest(t) AS tok FROM base)
      GROUP BY doc_id
    ),
    sig AS (
      SELECT w.doc_id,
             CAST(((len(ls) - len(list_distinct(ls))) * 1000000 + len(ls) // 2)
                  // len(ls) AS BIGINT) AS dup_line_frac_micros,
             CAST(((len(ps) - len(list_distinct(ps))) * 1000000 + len(ps) // 2)
                  // len(ps) AS BIGINT) AS dup_para_frac_micros,
             CAST(COALESCE((t2.c * length(t2.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                  AS BIGINT) AS top2_char_frac_micros,
             CAST(COALESCE((t3.c * length(t3.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                  AS BIGINT) AS top3_char_frac_micros,
             CAST(COALESCE((t4.c * length(t4.gram) * 1000000 + w.tc // 2) // w.tc, 0)
                  AS BIGINT) AS top4_char_frac_micros,
             {_GFULL_FRAC_COLS_SQL},
             CASE WHEN w.nw > 0 THEN
               CAST((COALESCE(s.syms, 0) * 1000000 + w.nw // 2) // w.nw AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS symbol_word_ratio_micros,
             CASE WHEN len(w.ls) > 0 THEN
               CAST((len(list_filter(w.ls,
                      x -> substr(x, 1, 1) IN ('•', '‣', '▪', '◦', '-', '*')))
                     * 1000000 + len(w.ls) // 2) // len(w.ls) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS bullet_line_frac_micros,
             CASE WHEN len(w.ls) > 0 THEN
               CAST((len(list_filter(w.ls,
                      x -> ends_with(x, '...') OR ends_with(x, '…')))
                     * 1000000 + len(w.ls) // 2) // len(w.ls) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS ellipsis_line_frac_micros
      FROM win w
      LEFT JOIN topg t2 ON t2.doc_id = w.doc_id AND t2.n = 2
      LEFT JOIN topg t3 ON t3.doc_id = w.doc_id AND t3.n = 3
      LEFT JOIN topg t4 ON t4.doc_id = w.doc_id AND t4.n = 4
      LEFT JOIN dup d ON d.doc_id = w.doc_id
      LEFT JOIN sym s ON s.doc_id = w.doc_id
    )
"""

_GG_BRANCHES_SQL = "\n      UNION ALL ".join(
    f"SELECT doc_id, '{rule}' AS rule, {int(thr * 1_000_000)} AS thr,"
    f" {rule}_micros AS val FROM sig"
    for rule, thr in sorted(gopher_fns.GOPHER_THRESHOLDS.items())
)


@register(
    "q_gopher_gate_counts",
    f"""
    WITH {_GG_SIG_SQL},
    longsig AS (
      {_GG_BRANCHES_SQL}
    )
    SELECT rule,
           CAST(thr AS BIGINT) AS threshold_micros,
           CAST(COUNT(CASE WHEN val > thr THEN 1 END) AS BIGINT)
             AS n_docs_over,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM longsig GROUP BY rule, thr
    """,
)
def q_gopher_gate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pre = docs.select(
        "doc_id",
        text_fns.tokens(F.col("text")).alias("_toks"),
        F.length(text_fns.normalize(F.col("text"))).cast("long").alias("_tc"),
    )
    sig = gopher_fns.repetition_signals(
        F.col("_toks"), F.col("_tc"), extended=True
    )
    rules = F.array(
        *[
            F.struct(
                F.lit(rule).alias("rule"),
                F.lit(int(thr * 1_000_000)).cast("long").alias("thr"),
                sig[f"{rule}_micros"].alias("val"),
            )
            for rule, thr in sorted(gopher_fns.GOPHER_THRESHOLDS.items())
        ]
    )
    long = pre.select(F.explode(rules).alias("r")).select("r.*")
    return long.groupBy("rule", "thr").agg(
        F.count(F.when(F.col("val") > F.col("thr"), 1))
        .cast("long")
        .alias("n_docs_over"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).select(
        "rule",
        F.col("thr").cast("long").alias("threshold_micros"),
        "n_docs_over",
        "n_docs",
    )


# ---------------------------------------------------------------------------
# Quality-threshold sweep: docs and TOKENS kept at each candidate
# score cutoff — the quality twin of q_dedup_curve (a curator fixes
# the cutoff by token budget, not doc count, so both measures ride
# one scored relation against a broadcast threshold spine).
# ---------------------------------------------------------------------------
@register(
    "q_quality_curve",
    f"""
    WITH base AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS ntok,
             CAST(FLOOR(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) * 1000000 + 0.5) AS BIGINT) AS pm,
             lang
      FROM documents
    ),
    scored AS (
      SELECT ntok,
             CAST(CASE WHEN lang = 'en' THEN 400000 ELSE 0 END
               + (300000 * least(ntok, 30) + 15) // 30
               + (300000 * (1000000 - least(pm * 5, 1000000)) + 500000)
                 // 1000000 AS BIGINT) AS score
      FROM base
    ),
    ts(t) AS (VALUES (400000), (500000), (600000), (700000), (800000), (900000))
    SELECT CAST(ts.t AS BIGINT) AS threshold,
           CAST(COUNT(CASE WHEN score >= ts.t THEN 1 END) AS BIGINT)
             AS docs_kept,
           CAST(COALESCE(SUM(CASE WHEN score >= ts.t THEN ntok END), 0)
                AS BIGINT) AS tokens_kept,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens
    FROM scored CROSS JOIN ts
    GROUP BY ts.t
    """,
)
def q_quality_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    pm = F.floor(text_fns.punct_ratio(F.col("text")) * 1_000_000 + 0.5).cast(
        "long"
    )
    base = docs.select(
        text_fns.n_tokens(F.col("text")).alias("ntok"), pm.alias("pm"), "lang"
    )
    score = (
        F.when(F.col("lang") == "en", F.lit(400000)).otherwise(F.lit(0))
        + F.expr("(300000 * least(ntok, 30) + 15) DIV 30")
        + F.expr(
            "(300000 * (1000000 - least(pm * 5, 1000000)) + 500000)"
            " DIV 1000000"
        )
    ).cast("long")
    scored = base.select("ntok", score.alias("score"))
    ts = spark.range(4, 10).select((F.col("id") * 100_000).alias("t"))
    keep = F.col("score") >= F.col("t")
    return (
        scored.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.count(F.when(keep, 1)).cast("long").alias("docs_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("ntok"))), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("t").cast("long").alias("threshold"),
            "docs_kept",
            "tokens_kept",
            "n_docs",
            "n_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier): parts no other part dominates on
# (cheaper-or-equal price, larger-or-equal size, one strict) —
# Borzsonyi et al., ICDE 2001. The naive form is an O(n^2) NOT
# EXISTS self-join; the distributed form here is two prefix maxima
# over the PER-PRICE aggregate: a part is on the skyline iff its
# size equals the max size at its price AND strictly exceeds the max
# size over all cheaper prices. The only window runs over the
# groupBy(price) relation — bounded by |distinct prices|, not fact
# rows (the advisor's legitimate-global-window shape) — and the join
# back is an Aggregate-rooted broadcast (BROADCAST_SCALED-bounded).
# No arithmetic touches p_retailprice, so the double equi-join key is
# bit-stable across engines.
# ---------------------------------------------------------------------------
@register(
    "q_skyline",
    """
    WITH g AS (
      SELECT p_retailprice AS price, MAX(p_size) AS gmax
      FROM part GROUP BY p_retailprice
    ),
    r AS (
      SELECT price, gmax,
             MAX(gmax) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM g
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN r ON p.p_retailprice = r.price
    WHERE p.p_size = r.gmax AND (r.pmax IS NULL OR p.p_size > r.pmax)
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("pmax", F.max("gmax").over(w))
    return (
        part.join(
            F.broadcast(r), part.p_retailprice == r.price
        )
        .filter(
            (F.col("p_size") == F.col("gmax"))
            & (F.col("pmax").isNull() | (F.col("p_size") > F.col("pmax")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (Wenzek et al., LREC 2020): score
# every document under the corpus's own bigram LM (the
# q_bigram_logprob machinery — two vocabulary-sized aggregates + one
# scan-stage self-alignment), rank docs per language by cost, and
# split each language into head / middle / tail thirds — the
# curation artifact CCNet feeds to its LM filter. The per-language
# rank is a staged grouped_rank (shuffle-fed input → auto
# localCheckpoint), so no fact-scale single-task window; every
# number stays an exact integer (ln() micros-quantized per pair, the
# standing cross-engine libm guard; bucket = ((rn-1)*3) DIV cnt).
# ---------------------------------------------------------------------------
@register(
    "q_ccnet_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, list_filter({_TOKENS_SQL}, t -> t <> '') AS ts
      FROM documents
    ),
    big AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
      FROM toks
    ),
    bcnt AS (SELECT bigram, COUNT(*) AS nb FROM big GROUP BY bigram),
    ucnt AS (
      SELECT w1, CAST(SUM(nb) AS BIGINT) AS nu FROM (
        SELECT string_split(bigram, ' ')[1] AS w1, nb FROM bcnt
      ) GROUP BY w1
    ),
    doc AS (
      SELECT doc_id,
             CAST(SUM(CAST(FLOOR(ln(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE))
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_lp,
             COUNT(*) AS nb_doc
      FROM big
      JOIN bcnt USING (bigram)
      JOIN ucnt ON string_split(bigram, ' ')[1] = w1
      GROUP BY doc_id
    ),
    scored AS (
      SELECT d.doc_id, t.lang, len(t.ts) AS ntok,
             ((-d.sum_lp) * 1000) // d.nb_doc AS cost_milli
      FROM doc d JOIN toks t USING (doc_id)
      WHERE d.nb_doc > 0
    ),
    ranked AS (
      SELECT lang, ntok, cost_milli,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cost_milli, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM scored
    )
    SELECT lang,
           CASE least(((rn - 1) * 3) // cnt, 2)
             WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
           END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(MIN(cost_milli) AS BIGINT) AS min_cost_milli,
           CAST(MAX(cost_milli) AS BIGINT) AS max_cost_milli
    FROM ranked GROUP BY lang, bucket
    """,
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(_tokens_col(), lambda t: t != "")
    base = docs.select("doc_id", "lang", ts.alias("ts"))
    bigrams_arr = F.transform(
        F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
        lambda _x, i: F.concat_ws(
            " ", F.element_at(F.col("ts"), i + 1), F.element_at(F.col("ts"), i + 2)
        ),
    )
    big = base.select("doc_id", F.explode(bigrams_arr).alias("bigram"))
    bcnt = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("nb"))
    ucnt = (
        bcnt.select(F.split(F.col("bigram"), " ").getItem(0).alias("w1"), "nb")
        .groupBy("w1")
        .agg(F.sum("nb").alias("nu"))
    )
    lp = F.floor(
        F.log(F.col("nb").cast("double") / F.col("nu").cast("double")) * 1000000
        + 0.5
    ).cast("long")
    doc = (
        big.join(bcnt, "bigram")
        .join(ucnt, F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"))
        .groupBy("doc_id")
        .agg(F.sum(lp).alias("sum_lp"), F.count(F.lit(1)).alias("nb_doc"))
    )
    scored = (
        doc.filter(F.col("nb_doc") > 0)
        .join(base.select("doc_id", "lang", F.size("ts").alias("ntok")), "doc_id")
        .select(
            "doc_id",
            "lang",
            "ntok",
            F.expr("((-sum_lp) * 1000) DIV nb_doc").alias("cost_milli"),
        )
    )
    ranked = grouped_rank(
        scored,
        ["lang"],
        [F.col("cost_milli"), F.col("doc_id")],
        rank_col="rn",
        count_col="cnt",
    )
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        (F.least(F.expr("((rn - 1) * 3) DIV cnt"), F.lit(2)) + 1).cast("int"),
    )
    return (
        ranked.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.min("cost_milli").cast("long").alias("min_cost_milli"),
            F.max("cost_milli").cast("long").alias("max_cost_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility: subword-per-word and chars-per-subword ratios
# per (source, lang) — the table a tokenizer owner reads to spot
# sources whose text fragments badly (high fertility = wasted
# context window). Whitespace words vs the BPE-ish regex estimate of
# q_tokens_bpe; all pure scan expressions (no explode, no per-token
# shuffle) into one groupBy; ratios as exact integer millis
# ((num*1000 + den DIV 2) DIV den, positive operands).
# ---------------------------------------------------------------------------
@register(
    "q_fertility",
    f"""
    WITH d AS (
      SELECT source, lang,
             length(text) AS nchars,
             len({_TOKENS_SQL}) AS nws,
             COALESCE(list_aggregate(list_transform(
               regexp_extract_all({_NORM_SQL}, '{text_fns.TOKEN_REGEX}'),
               t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum'), 0) AS nbpe
      FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nws) AS BIGINT) AS ws_tokens,
           CAST(SUM(nbpe) AS BIGINT) AS bpe_tokens,
           CAST((SUM(nbpe) * 1000 + SUM(nws) // 2) // SUM(nws) AS BIGINT)
             AS fertility_milli,
           CAST((SUM(nchars) * 1000 + SUM(nbpe) // 2) // SUM(nbpe) AS BIGINT)
             AS chars_per_bpe_milli
    FROM d GROUP BY source, lang
    """,
)
def q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    rtoks = text_fns.regex_tokens(text_fns.normalize(F.col("text")))
    nbpe = F.aggregate(
        F.transform(rtoks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = docs.select(
        "source",
        "lang",
        F.length("text").cast("long").alias("nchars"),
        text_fns.n_tokens(F.col("text")).cast("long").alias("nws"),
        nbpe.alias("nbpe"),
    )
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nws").cast("long").alias("ws_tokens"),
        F.sum("nbpe").cast("long").alias("bpe_tokens"),
        F.expr("CAST((SUM(nbpe) * 1000 + SUM(nws) DIV 2) DIV SUM(nws) AS BIGINT)")
        .alias("fertility_milli"),
        F.expr(
            "CAST((SUM(nchars) * 1000 + SUM(nbpe) DIV 2) DIV SUM(nbpe) AS BIGINT)"
        ).alias("chars_per_bpe_milli"),
    )


# ---------------------------------------------------------------------------
# SimHash separation audit: does Hamming distance actually separate
# near-duplicates from unrelated documents on THIS corpus? Planted
# near-copy pairs (label 'dup') and consecutive-id original pairs
# (label 'non_dup') are both scored with (a) the 60-bit SimHash
# Hamming distance and (b) exact shingle Jaccard — the calibration
# table a curator reads before picking the Hamming band threshold,
# completing the accuracy-audit family next to q_minhash_accuracy /
# q_minhash_calibration. The pair set is O(N) BY CONSTRUCTION (two
# explicit pairs per doc — no candidate generation, no self-join);
# intersections ride equi-joins on (doc, shingle); Jaccard is
# integer micros ((2*ncom*1e6 + un) DIV (2*un)), so the only float
# is one closing division of exact ints.
# ---------------------------------------------------------------------------
@register(
    "q_simhash_accuracy",
    f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    shingled AS ({_SHINGLES_SQL.format(tokens=_TOKENS_SQL, corpus="SELECT * FROM corpus")}),
    hashed AS (
      SELECT doc, {hash60_sql("shingle", seed="sh")} AS h FROM shingled
    ),
    votes AS (
      SELECT doc, b.bit, SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
      FROM hashed, range(0, 60) b(bit) GROUP BY doc, b.bit
    ),
    sig AS (
      SELECT doc, CAST(SUM(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    ),
    orig AS (SELECT doc_id FROM documents),
    prs AS (
      SELECT doc_id AS a, doc_id + {_DUP_OFFSET} AS b, 'dup' AS label FROM orig
      UNION ALL
      SELECT o.doc_id, o.doc_id + 1, 'non_dup'
      FROM orig o JOIN orig p ON p.doc_id = o.doc_id + 1
    ),
    sizes AS (SELECT doc, COUNT(*) AS n FROM shingled GROUP BY doc),
    inter AS (
      SELECT p.a, p.b, COUNT(*) AS ncom
      FROM prs p
      JOIN shingled x ON x.doc = p.a
      JOIN shingled y ON y.doc = p.b AND y.shingle = x.shingle
      GROUP BY p.a, p.b
    ),
    j AS (
      SELECT p.label,
             CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming,
             COALESCE(i.ncom, 0) AS ncom,
             za.n + zb.n - COALESCE(i.ncom, 0) AS un
      FROM prs p
      JOIN sig sa ON sa.doc = p.a
      JOIN sig sb ON sb.doc = p.b
      JOIN sizes za ON za.doc = p.a
      JOIN sizes zb ON zb.doc = p.b
      LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    )
    SELECT label, hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN un > 0
                         THEN (2 * ncom * 1000000 + un) // (2 * un)
                         ELSE 0 END) AS DOUBLE) / 1000000 / COUNT(*)
             AS mean_jaccard
    FROM j GROUP BY label, hamming
    """,
)
def q_simhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    sigs = simh_ops.simhash(corpus, "doc_id", "text")
    orig = load_table(spark, sf_dir, "documents").select("doc_id")
    dup = orig.select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + _DUP_OFFSET).alias("b"),
        F.lit("dup").alias("label"),
    )
    nxt = orig.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
    nondup = nxt.join(
        orig.select(F.col("doc_id").alias("b")), "b", "left_semi"
    ).withColumn("label", F.lit("non_dup"))
    prs = dup.unionByName(nondup.select("a", "b", "label"))
    sh = jac_ops.shingle_index(corpus, "doc_id", "text", 3)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    ia = sh.select(F.col("doc").alias("a"), "shingle").join(
        prs.select("a", "b"), "a"
    )
    inter = (
        ia.join(sh.select(F.col("doc").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("ncom"))
    )
    j = (
        prs.join(
            sigs.select(F.col("doc").alias("a"), F.col("simhash").alias("sa")), "a"
        )
        .join(sigs.select(F.col("doc").alias("b"), F.col("simhash").alias("sb")), "b")
        .join(sizes.select(F.col("doc").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("n").alias("nb")), "b")
        .join(inter, ["a", "b"], "left")
        .select(
            "label",
            F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("hamming"),
            F.coalesce(F.col("ncom"), F.lit(0)).alias("ncom"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("ncom"), F.lit(0))).alias(
                "un"
            ),
        )
    )
    return j.groupBy("label", "hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.sum(
                F.when(
                    F.col("un") > 0,
                    F.expr("(2 * ncom * 1000000 + un) DIV (2 * un)"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / 1000000
            / F.count(F.lit(1))
        ).alias("mean_jaccard"),
    )


# ---------------------------------------------------------------------------
# Per-node clustering coefficient on the co-purchase graph: the
# local triangle density 2T(v) / deg(v)(deg(v)-1) (Watts-Strogatz) —
# the node-level refinement of q_triangle_count, sharing its
# degree-oriented wedge machinery (Suri & Vassilvitskii, WWW'11):
# each triangle is still enumerated once at its lowest-degree
# vertex, then credited to all three corners with one explode.
# Coefficients are exact integer micros; the node dimension is
# bounded by |part|, so the output relation is dimension-sized.
# ---------------------------------------------------------------------------
@register(
    "q_clustering_coeff",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_orderkey,
             LEAST(a.l_partkey, b.l_partkey) AS u,
             GREATEST(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (SELECT DISTINCT u, v FROM pairs),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tn AS (
      SELECT node, COUNT(*) AS t
      FROM (SELECT unnest([a, b, c]) AS node FROM tri)
      GROUP BY node
    ),
    deg AS (
      SELECT n, COUNT(*) AS d
      FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
      GROUP BY n
    )
    SELECT deg.n AS node, CAST(d AS BIGINT) AS degree,
           CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
           CAST((4 * COALESCE(t, 0) * 1000000 + d * (d - 1))
                // (2 * d * (d - 1)) AS BIGINT) AS clustering_micros
    FROM deg LEFT JOIN tn ON tn.node = deg.n
    WHERE d >= 2
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("a"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("b"))
    wedges = w1.join(w2, "p").filter(F.col("a") < F.col("b"))
    canon = edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    tri_nodes = (
        wedges.join(canon, ["a", "b"])
        .select(F.explode(F.array("p", "a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri_nodes, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST((4 * COALESCE(t, 0) * 1000000 + deg * (deg - 1))"
                " DIV (2 * deg * (deg - 1)) AS BIGINT)"
            ).alias("clustering_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Common-neighbor link prediction on the co-purchase graph: for part
# pairs NOT yet co-purchased, count shared neighbors and score with
# neighborhood Jaccard (Liben-Nowell & Kleinberg, CIKM'03) — the
# "customers also bought" candidate list. Candidate pairs come from
# per-pivot sorted-adjacency i<j expansion, with pivots capped at
# degree <= _LP_MAX_DEG (the posting-list stop-shingle pattern: a
# hub pivot is D^2 pairs and near-zero signal; the cap is mirrored
# in the oracle). Existing edges drop via one anti-join; the result
# is a deterministic top-20 under the strict (common, a, b) order.
# ---------------------------------------------------------------------------
_LP_MAX_DEG = 1024


@register(
    "q_link_prediction",
    f"""
    WITH pairs0 AS (
      SELECT DISTINCT a.l_orderkey,
             LEAST(a.l_partkey, b.l_partkey) AS u,
             GREATEST(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (SELECT DISTINCT u, v FROM pairs0),
    nb AS (SELECT u AS p, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT p, COUNT(*) AS d FROM nb GROUP BY p),
    cand AS (
      SELECT x.n AS a2, y.n AS b2, COUNT(*) AS common
      FROM nb x
      JOIN nb y ON x.p = y.p AND x.n < y.n
      JOIN deg ON deg.p = x.p AND deg.d <= {_LP_MAX_DEG}
      GROUP BY 1, 2
    ),
    newl AS (
      SELECT c.* FROM cand c
      LEFT JOIN e ON e.u = c.a2 AND e.v = c.b2
      WHERE e.u IS NULL
    )
    SELECT a2 AS part_a, b2 AS part_b,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST((2 * common * 1000 + (da.d + db.d - common))
                // (2 * (da.d + db.d - common)) AS BIGINT) AS jaccard_milli
    FROM newl
    JOIN deg da ON da.p = a2
    JOIN deg db ON db.p = b2
    ORDER BY common_neighbors DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    nb = edges.select(F.col("u").alias("p"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("p"), F.col("u").alias("n"))
    )
    adj = (
        nb.groupBy("p")
        .agg(F.array_sort(F.collect_list("n")).alias("ns"))
        .filter((F.size("ns") >= 2) & (F.size("ns") <= _LP_MAX_DEG))
    )
    cand = (
        adj.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns) - i - 1), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("w")
        )
        .select("w.a", "w.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    canon = edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    newl = cand.join(canon, ["a", "b"], "left_anti")
    deg = nb.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    return (
        newl.join(deg.select(F.col("p").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("p").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("common").cast("long").alias("common_neighbors"),
            F.expr(
                "CAST((2 * common * 1000 + (da + db - common))"
                " DIV (2 * (da + db - common)) AS BIGINT)"
            ).alias("jaccard_milli"),
        )
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bounded semantic dedup (dedup/semdedup.py; Abbas
# et al. 2023, arXiv:2303.09540). The k-means codebook is replaced by
# a deterministic md5-seeded ±1 codebook so the ENTIRE pipeline —
# assignment argmax, within-cluster pairs, greedy min-id drops — is
# reproduced bit-for-bit by the oracle (the q_dedup_embed_lsh trade).
# Corpus = vec_id < 1000 plus perturbed near-copies, so true semantic
# dups exist at every SF and the within-cluster pair expansion stays
# oracle-feasible at sf0.1. The max_cluster=4000 guard (the scale
# posture: never expand a degenerate codebook cell quadratically) is
# mirrored in the oracle's csize CTE.
# ---------------------------------------------------------------------------
from frames_spark.dedup import semdedup as sem_ops  # noqa: E402

_SEM_K = 16
_SEM_TAU = 0.9
_SEM_MAX_CLUSTER = 4000
_SEM_CORPUS_SQL = _emb_corpus_sql("WHERE vec_id < 1000")


def _sem_cents_values() -> str:
    return ",".join(
        f"({c},{i + 1},{s})"
        for c in range(_SEM_K)
        for i, s in enumerate(sem_ops.centroid_components(c, 64))
    )


def _semdedup_oracle(
    final_select: str, corpus_sql: str | None = None, tau: float | None = None
) -> str:
    return f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus=corpus_sql or _SEM_CORPUS_SQL)}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    cents AS (SELECT * FROM (VALUES {_sem_cents_values()}) t(c, i, s)),
    cdots AS (
      SELECT f.vec_id, c.c, SUM(f.e * c.s) AS dot
      FROM fixed f JOIN cents c USING (i) GROUP BY 1, 2
    ),
    best AS (
      SELECT vec_id, c AS cluster FROM (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, c ASC) AS rn
        FROM cdots
      ) WHERE rn = 1
    ),
    csize AS (SELECT cluster, COUNT(*) AS n FROM best GROUP BY cluster),
    ok AS (SELECT cluster FROM csize WHERE n <= {_SEM_MAX_CLUSTER}),
    pairdots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, ba.cluster,
             SUM(a.e * b.e) AS dot
      FROM fixed a
      JOIN best ba ON ba.vec_id = a.vec_id
      JOIN fixed b ON a.i = b.i AND a.vec_id < b.vec_id
      JOIN best bb ON bb.vec_id = b.vec_id AND bb.cluster = ba.cluster
      JOIN ok ON ok.cluster = ba.cluster
      GROUP BY 1, 2, 3
    ),
    sim AS (
      SELECT id_a, id_b, cluster
      FROM pairdots
      JOIN norms na ON id_a = na.vec_id
      JOIN norms nb ON id_b = nb.vec_id
      WHERE CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
            >= {tau if tau is not None else _SEM_TAU}
    )
    {final_select}
    """


def _sem_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return _with_perturbed_copies(emb)


@register(
    "q_semdedup",
    _semdedup_oracle("SELECT DISTINCT id_b AS vec_id, cluster FROM sim"),
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sem_ops.semdedup_drops(
        _sem_corpus(spark, sf_dir), "vec_id", "embedding",
        n_centroids=_SEM_K, threshold=_SEM_TAU, max_cluster=_SEM_MAX_CLUSTER,
    )


@register(
    "q_semdedup_summary",
    _semdedup_oracle("""
    , memb AS (SELECT cluster, COUNT(*) AS n_members FROM best GROUP BY cluster),
    drops AS (SELECT cluster, COUNT(DISTINCT id_b) AS nd FROM sim GROUP BY cluster)
    SELECT m.cluster, m.n_members,
           CAST(COALESCE(d.nd, 0) AS BIGINT) AS n_dropped
    FROM memb m LEFT JOIN drops d USING (cluster)
    """),
)
def q_semdedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sem_ops.semdedup_summary(
        _sem_corpus(spark, sf_dir), "vec_id", "embedding",
        n_centroids=_SEM_K, threshold=_SEM_TAU, max_cluster=_SEM_MAX_CLUSTER,
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (pipelines/dsir.py; Xie et al. 2023,
# arXiv:2302.03169): hashed-unigram bucket models over a TARGET
# corpus (lang='en' as the proxy) vs the RAW corpus; per-doc
# importance log-weight = sum of quantized per-bucket log-ratios —
# exact integers after the one ln per bucket (q_kl_source idiom),
# deterministic top-100 selection. Bucket models are n_buckets-row
# bounded broadcasts; the corpus tokenizes once.
# ---------------------------------------------------------------------------
from frames_spark.pipelines import dsir as dsir_ops  # noqa: E402

_DSIR_B = 4096


@register(
    "q_dsir",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tk AS (
      SELECT doc_id, lang,
             {hash60_sql("term", "dsir")} % {_DSIR_B} AS bucket
      FROM tok WHERE term <> ''
    ), db AS (
      SELECT doc_id, lang, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3
    ), cr AS (
      SELECT bucket, SUM(c) AS cr FROM db GROUP BY bucket
    ), ct AS (
      SELECT bucket, SUM(c) AS ct FROM db WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
      SELECT SUM(c) AS nr,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt
      FROM db
    ), lam AS (
      SELECT cr.bucket,
             CAST(FLOOR(ln(
               (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                  * (CAST(tot.nr AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
               / (CAST(cr.cr + 1 AS DOUBLE)
                  * (CAST(tot.nt AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
             ) * 1000000000 + 0.5) AS BIGINT) AS lam_nanos
      FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket CROSS JOIN tot
    ), s AS (
      SELECT doc_id, SUM(c * lam_nanos) AS logw_nanos
      FROM db JOIN lam USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, CAST(logw_nanos AS BIGINT) AS logw_nanos
    FROM s ORDER BY logw_nanos DESC, doc_id LIMIT 100
    """,
)
def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    return dsir_ops.dsir_select(
        docs, "doc_id", "text", F.col("lang") == "en",
        k=100, n_buckets=_DSIR_B,
    )


# ---------------------------------------------------------------------------
# Native session windows: Spark's built-in F.session_window (the
# operator the streaming engine uses for session state) run in batch
# and proven against the gaps-and-islands reference semantics.
# Boundary: an event exactly `gap` after its predecessor starts a NEW
# session — session windows are half-open [start, last + gap), so the
# oracle's new-session predicate is >= (q_sessionize's custom
# sessionizer implements the closed variant with >, documented there;
# both are correct, they are different published operators).
# Handoff in integral micros (epoch_us/unix_micros) — whole-second
# timestamp keys diverge between engines at sf0.1 densities.
# ---------------------------------------------------------------------------
@register(
    "q_session_window",
    """
    WITH marked AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch_us(CAST(ts AS TIMESTAMP))
                          - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                            OVER (PARTITION BY user_id ORDER BY ts)
                          >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, tus,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           CAST(MIN(tus) AS BIGINT) AS start_us,
           CAST(MAX(tus) + 1800000000 AS BIGINT) AS end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Learned classifier: multinomial naive Bayes over hashed unigram
# buckets (pipelines/nbayes.py; McCallum & Nigam 1998). Trains per-
# class token distributions on doc_id % 5 != 0 in ONE aggregation
# pass, scores the held-out fifth with exact integer log-prob sums
# (every ln quantized to nanos at the call — the q_kl_source idiom),
# and returns the confusion matrix. The model relations are bounded
# broadcasts (≤ n_buckets x n_classes); the corpus shuffles once,
# keyed by doc. Complements q_langid's fixed heuristic with a
# trained model under the same hard oracle gate.
# ---------------------------------------------------------------------------
from frames_spark.pipelines import nbayes as nb_ops  # noqa: E402

_NB_B = 4096


@register(
    "q_nb_confusion",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tk AS (
      SELECT doc_id, lang,
             {hash60_sql("term", "nb")} % {_NB_B} AS bucket
      FROM tok WHERE term <> ''
    ), db AS (
      SELECT doc_id, lang, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3
    ), train AS (SELECT * FROM db WHERE doc_id % 5 <> 0),
    test AS (SELECT * FROM db WHERE doc_id % 5 = 0),
    ncb AS (SELECT lang AS cand, bucket, SUM(c) AS ncb FROM train GROUP BY 1, 2),
    nc AS (SELECT cand, SUM(ncb) AS nc FROM ncb GROUP BY 1),
    dc AS (SELECT lang AS cand, COUNT(DISTINCT doc_id) AS dcount FROM train GROUP BY 1),
    dtot AS (SELECT COUNT(DISTINCT doc_id) AS dt FROM train),
    lp AS (
      SELECT cand, bucket,
             CAST(FLOOR(ln(CAST(ncb + 1 AS DOUBLE)
                           / (CAST(nc AS DOUBLE) + CAST({_NB_B} AS DOUBLE)))
                        * 1000000000 + 0.5) AS BIGINT) AS lp_nanos
      FROM ncb JOIN nc USING (cand)
    ), stats AS (
      SELECT nc.cand,
             CAST(FLOOR(ln(CAST(1 AS DOUBLE)
                           / (CAST(nc AS DOUBLE) + CAST({_NB_B} AS DOUBLE)))
                        * 1000000000 + 0.5) AS BIGINT) AS def_nanos,
             CAST(FLOOR(ln(CAST(dcount AS DOUBLE) / CAST(dt AS DOUBLE))
                        * 1000000000 + 0.5) AS BIGINT) AS prior_nanos
      FROM nc JOIN dc USING (cand) CROSS JOIN dtot
    ), terms AS (
      SELECT t.doc_id, t.lang, s.cand, s.prior_nanos,
             t.c * COALESCE(lp.lp_nanos, s.def_nanos) AS term
      FROM test t
      CROSS JOIN stats s
      LEFT JOIN lp ON lp.cand = s.cand AND lp.bucket = t.bucket
    ), scored AS (
      SELECT doc_id, lang, cand,
             SUM(term) + prior_nanos AS score
      FROM terms GROUP BY doc_id, lang, cand, prior_nanos
    ), pred AS (
      SELECT doc_id, lang, cand AS pred FROM (
        SELECT doc_id, lang, cand,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT lang, pred, COUNT(*) AS n FROM pred GROUP BY lang, pred
    """,
)
def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    return nb_ops.nb_confusion(
        docs, "doc_id", "text", "lang", n_buckets=_NB_B
    ).select(F.col("_label").alias("lang"), "pred", F.col("n").cast("long").alias("n"))


# Gumbel-top-k DSIR resampling — the paper's actual selection rule:
# k docs sampled without replacement ∝ importance weight via
# argtop-k(log w + Gumbel) (Vieira 2014; Kool et al. 2019). The
# Gumbel is deterministic in (doc_id, seed) and quantized to the same
# integer nanos scale as the log-weight, so the sampled SET is
# engine- and layout-independent — the A-ES trick of
# q_weighted_sample, in Gumbel form, riding the q_dsir weights.
@register(
    "q_dsir_sample",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tk AS (
      SELECT doc_id, lang,
             {hash60_sql("term", "dsir")} % {_DSIR_B} AS bucket
      FROM tok WHERE term <> ''
    ), db AS (
      SELECT doc_id, lang, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3
    ), cr AS (
      SELECT bucket, SUM(c) AS cr FROM db GROUP BY bucket
    ), ct AS (
      SELECT bucket, SUM(c) AS ct FROM db WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
      SELECT SUM(c) AS nr,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt
      FROM db
    ), lam AS (
      SELECT cr.bucket,
             CAST(FLOOR(ln(
               (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                  * (CAST(tot.nr AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
               / (CAST(cr.cr + 1 AS DOUBLE)
                  * (CAST(tot.nt AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
             ) * 1000000000 + 0.5) AS BIGINT) AS lam_nanos
      FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket CROSS JOIN tot
    ), s AS (
      SELECT doc_id, SUM(c * lam_nanos) AS logw_nanos
      FROM db JOIN lam USING (bucket) GROUP BY doc_id
    ), keyed AS (
      SELECT doc_id, CAST(logw_nanos AS BIGINT) AS logw_nanos,
             CAST(logw_nanos AS BIGINT) + CAST(FLOOR(
               -ln(-ln(CAST({hash60_sql("CAST(doc_id AS VARCHAR)", "dsirg")} + 1 AS DOUBLE)
                       / {float(1 << 60)}))
               * 1000000000 + 0.5) AS BIGINT) AS gumbel_key
      FROM s
    )
    SELECT doc_id, logw_nanos, gumbel_key
    FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 100
    """,
)
def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    return dsir_ops.dsir_sample(
        docs, "doc_id", "text", F.col("lang") == "en",
        k=100, n_buckets=_DSIR_B,
    )


# Domain-level importance: mean DSIR log-weight per source — the
# DoReMi-adjacent view (which DOMAINS to upweight, not which docs).
# Mean as exact integer floor-div of the nanos sum; rides the same
# bucket models as q_dsir.
@register(
    "q_dsir_by_source",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, source, unnest({_TOKENS_SQL}) AS term FROM documents
    ), tk AS (
      SELECT doc_id, lang, source,
             {hash60_sql("term", "dsir")} % {_DSIR_B} AS bucket
      FROM tok WHERE term <> ''
    ), db AS (
      SELECT doc_id, lang, source, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3, 4
    ), cr AS (
      SELECT bucket, SUM(c) AS cr FROM db GROUP BY bucket
    ), ct AS (
      SELECT bucket, SUM(c) AS ct FROM db WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
      SELECT SUM(c) AS nr,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt
      FROM db
    ), lam AS (
      SELECT cr.bucket,
             CAST(FLOOR(ln(
               (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                  * (CAST(tot.nr AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
               / (CAST(cr.cr + 1 AS DOUBLE)
                  * (CAST(tot.nt AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
             ) * 1000000000 + 0.5) AS BIGINT) AS lam_nanos
      FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket CROSS JOIN tot
    ), s AS (
      SELECT doc_id, MIN(source) AS source, SUM(c * lam_nanos) AS logw_nanos
      FROM db JOIN lam USING (bucket) GROUP BY doc_id
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST((SUM(logw_nanos) - ((SUM(logw_nanos) % COUNT(*)) + COUNT(*)) % COUNT(*))
                / COUNT(*) AS BIGINT) AS mean_logw_nanos
    FROM s GROUP BY source
    """,
)
def q_dsir_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    w = dsir_ops.dsir_logweights(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=_DSIR_B
    )
    per_doc = w.join(docs.select("doc_id", "source"), "doc_id")
    # floor division toward -inf on both engines: Spark's pmod trick
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            (
                F.sum("logw_nanos")
                - F.pmod(F.sum("logw_nanos"), F.count(F.lit(1)))
            )
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_logw_nanos"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal-Rank Fusion (similarity/fusion.py;
# Cormack et al. SIGIR'09) of a lexical leg (distinct-token overlap
# via a broadcast inverted index — never doc x doc) and an embedding
# leg (exact brute-force cosine, the q_ann_bruteforce machinery) for
# query docs {0,1,2}, treating doc_id == vec_id. Every leg rank is a
# row_number under a strict total order and every reciprocal is the
# exact integer 1000000 DIV (60 + rank), so fused scores are exact
# integer sums — full oracle.
# ---------------------------------------------------------------------------
from frames_spark.similarity import fusion as fusion_ops  # noqa: E402

_RRF_DEPTH = 20


@register(
    "q_rrf_hybrid",
    f"""
    WITH ltok AS (
      SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS term FROM documents
    ), lq AS (
      SELECT doc_id AS query_id, term FROM ltok WHERE doc_id < 3 AND term <> ''
    ), ld AS (
      SELECT doc_id, term FROM ltok WHERE term <> ''
    ), lov AS (
      SELECT lq.query_id, ld.doc_id, COUNT(*) AS overlap
      FROM ld JOIN lq USING (term)
      WHERE ld.doc_id <> lq.query_id
      GROUP BY 1, 2
    ), lleg AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY overlap DESC, doc_id ASC) AS rnk
        FROM lov
      ) WHERE rnk <= {_RRF_DEPTH}
    ), fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    edots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id, SUM(q.e * c.e) AS dot
      FROM fixed q JOIN fixed c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 3
      GROUP BY 1, 2
    ), escored AS (
      SELECT query_id, doc_id,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      FROM edots JOIN norms nq ON query_id = nq.vec_id
                 JOIN norms nc ON doc_id = nc.vec_id
    ), eleg AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, doc_id ASC) AS rnk
        FROM escored
      ) WHERE rnk <= {_RRF_DEPTH}
    ), contrib AS (
      SELECT query_id, doc_id, 1000000 // (60 + rnk) AS contrib FROM lleg
      UNION ALL
      SELECT query_id, doc_id, 1000000 // (60 + rnk) AS contrib FROM eleg
    ), fused AS (
      SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS rrf_micros
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rrf_micros, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_id, doc_id, rrf_micros,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_micros DESC, doc_id ASC) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """,
)
def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    lex = fusion_ops.lexical_overlap_leg(
        docs, "doc_id", "text", [0, 1, 2], depth=_RRF_DEPTH
    )
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    from frames_spark.similarity.ann import brute_force_topk

    eleg = brute_force_topk(
        emb, queries, "vec_id", "embedding", k=_RRF_DEPTH
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = fusion_ops.rrf_fuse([lex, eleg], k=60, topk=10)
    return fused.select(
        "query_id", "doc_id", "rrf_micros", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# k-center coreset: greedy farthest-point traversal (similarity/
# coreset.py; Gonzalez 1985) — k maximally-spread exemplars, the
# classic diverse-subset selector. Exact integer squared-L2 over the
# fixed-point vectors makes every round's argmax deterministic, so
# the ENTIRE k-round trace carries a full oracle: one unrolled
# MATERIALIZED CTE per round (the q_markov_stationary device —
# default CTE inlining re-expands the chain exponentially).
# ---------------------------------------------------------------------------
_KC_K = 8


def _kcenter_oracle(k: int) -> str:
    # each round's center row is materialized FIRST (c{r}: 64 rows) —
    # a scalar subquery inside the join condition does not get pushed
    # into the scan of `b`, which would make every round a full
    # i-join of the corpus with itself
    parts = [
        f"WITH fixed AS MATERIALIZED ({_FIXED_SQL.format(corpus='SELECT vec_id, embedding FROM embeddings')}),",
        "seed AS (SELECT MIN(vec_id) AS sid FROM fixed),",
        """c1 AS MATERIALIZED (
          SELECT i, e FROM fixed WHERE vec_id = (SELECT sid FROM seed)
        ),
        m1 AS MATERIALIZED (
          SELECT a.vec_id, SUM((a.e - b.e) * (a.e - b.e)) AS mind
          FROM fixed a JOIN c1 b ON a.i = b.i
          GROUP BY a.vec_id
        ),
        s1 AS (SELECT vec_id, mind FROM m1 ORDER BY mind DESC, vec_id LIMIT 1)""",
    ]
    for r in range(2, k):
        parts.append(
            f""",
        c{r} AS MATERIALIZED (
          SELECT i, e FROM fixed WHERE vec_id = (SELECT vec_id FROM s{r - 1})
        ),
        d{r} AS MATERIALIZED (
          SELECT a.vec_id, SUM((a.e - b.e) * (a.e - b.e)) AS d2
          FROM fixed a JOIN c{r} b ON a.i = b.i
          GROUP BY a.vec_id
        ),
        m{r} AS MATERIALIZED (
          SELECT m{r - 1}.vec_id, LEAST(m{r - 1}.mind, d{r}.d2) AS mind
          FROM m{r - 1} JOIN d{r} USING (vec_id)
        ),
        s{r} AS (SELECT vec_id, mind FROM m{r} ORDER BY mind DESC, vec_id LIMIT 1)"""
        )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS round, sid AS vec_id, CAST(0 AS BIGINT) AS dist2 FROM seed"
    ] + [
        f"SELECT CAST({r} AS BIGINT) AS round, vec_id, CAST(mind AS BIGINT) AS dist2 FROM s{r}"
        for r in range(1, k)
    ]
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("q_kcenter", _kcenter_oracle(_KC_K))
def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity import coreset as coreset_ops

    emb = load_table(spark, sf_dir, "embeddings")
    return coreset_ops.kcenter_trace_df(spark, emb, "vec_id", "embedding", k=_KC_K)


# ---------------------------------------------------------------------------
# Prefix-filtered edit-distance join (dedup/editdist.py
# qgram_edit_pairs; Gravano VLDB'01 + Chaudhuri ICDE'06): all pairs
# within levenshtein <= 2 over a high-entropy deterministic corpus
# (md5-hex keys of every 7th customer, plus planted 1- and 2-deletion
# variants, so true pairs exist at every SF and natural collisions
# are negligible — the synthetic names themselves are too low-entropy
# for a similarity join to be meaningful: nearly half of all name
# pairs are within distance 2). Candidate generation is EXACT (the
# count bound guarantees prefix collision), posting lists hold only
# the 7 rarest multiset grams per string, and the oracle mirrors the
# whole pipeline including the final levenshtein verify.
# ---------------------------------------------------------------------------
from frames_spark.dedup import editdist as edit_ops  # noqa: E402

_EDIT_CORPUS_SQL = """
  SELECT s FROM (
    SELECT substr(md5('ed#' || CAST(c_custkey AS VARCHAR)), 1, 16) AS s
    FROM customer WHERE c_custkey % 7 = 0
  )
  UNION
  SELECT substr(s, 1, 8) || substr(s, 10, len(s)) AS s FROM (
    SELECT substr(md5('ed#' || CAST(c_custkey AS VARCHAR)), 1, 16) AS s
    FROM customer WHERE c_custkey % 7 = 0
  )
  UNION
  SELECT substr(s, 1, 3) || substr(s, 5, 4) || substr(s, 10, len(s)) AS s FROM (
    SELECT substr(md5('ed#' || CAST(c_custkey AS VARCHAR)), 1, 16) AS s
    FROM customer WHERE c_custkey % 7 = 0
  )
"""


@register(
    "q_edit_join",
    f"""
    WITH vocab AS ({_EDIT_CORPUS_SQL}),
    g AS (
      SELECT s, unnest(list_transform(range(1, len(s) - 1), i -> substr(s, i, 3))) AS gram
      FROM vocab WHERE len(s) >= 3
    ), gc AS (SELECT s, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    occ AS (SELECT s, gram, unnest(range(1, CAST(c + 1 AS INT))) AS o FROM gc),
    dfr AS (SELECT gram, o, COUNT(*) AS dfr FROM occ GROUP BY 1, 2),
    pref AS (
      SELECT s, gram, o FROM (
        SELECT occ.s, occ.gram, occ.o,
               ROW_NUMBER() OVER (PARTITION BY occ.s
                                  ORDER BY dfr.dfr, occ.gram, occ.o) AS rn
        FROM occ JOIN dfr USING (gram, o)
      ) WHERE rn <= 7
    ), b AS (
      SELECT gram, o, list(s ORDER BY s) AS ss FROM pref
      GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 10000
    ), cand AS (
      SELECT DISTINCT v1.s AS a, v2.s AS b
      FROM (SELECT gram, o, unnest(ss) AS s FROM b) v1
      JOIN (SELECT gram, o, unnest(ss) AS s FROM b) v2
        ON v1.gram = v2.gram AND v1.o = v2.o AND v1.s < v2.s
      WHERE abs(len(v1.s) - len(v2.s)) <= 2
    )
    SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS lev
    FROM cand WHERE levenshtein(a, b) <= 2
    """,
)
def q_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edit_ops.qgram_edit_pairs(
        _edit_corpus(spark, sf_dir), "s", k=2, q=3
    )


def _edit_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    )
    base = cust.select(
        F.substring(
            F.md5(F.concat(F.lit("ed#"), F.col("c_custkey").cast("string"))),
            1,
            16,
        ).alias("s")
    )
    s = F.col("s")
    del1 = base.select(
        F.concat(s.substr(F.lit(1), F.lit(8)), s.substr(F.lit(10), F.length(s))).alias("s")
    )
    del2 = base.select(
        F.concat(
            s.substr(F.lit(1), F.lit(3)),
            s.substr(F.lit(5), F.lit(4)),
            s.substr(F.lit(10), F.length(s)),
        ).alias("s")
    )
    return base.union(del1).union(del2).distinct()


# ---------------------------------------------------------------------------
# Entity resolution: connected components over the edit-distance
# graph — every cluster of mutually-similar strings labeled by its
# lexicographically-smallest member (dedup/cluster.py iterative
# min-label CC, deterministic fixpoint). The oracle computes the
# SAME components from first principles: the full prefix-filter edit
# join (reused verbatim from q_edit_join's SQL) plus a recursive-CTE
# reachability closure + MIN(label) — an end-to-end independent
# derivation, feasible because edit components are tiny (planted
# triplets), while the Spark side's min-label iteration is the
# 100 TB path.
# ---------------------------------------------------------------------------
@register(
    "q_entity_clusters",
    f"""
    WITH RECURSIVE pairs AS ({ORACLES["q_edit_join"]}),
    nodes AS (SELECT a AS s FROM pairs UNION SELECT b AS s FROM pairs),
    sym AS (
      SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
    ),
    reach(s, r) AS (
      SELECT s, s AS r FROM nodes
      UNION
      SELECT e.b AS s, reach.r FROM reach JOIN sym e ON e.a = reach.s
    )
    SELECT s AS node, MIN(r) AS component FROM reach GROUP BY s
    """,
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = edit_ops.qgram_edit_pairs(
        _edit_corpus(spark, sf_dir), "s", k=2, q=3
    )
    return cluster_ops.connected_components(pairs, "a", "b").select(
        "node", "component"
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH ANN (similarity/ann.py multiprobe_topk; Lv et al.
# VLDB'07): queries probe their bucket plus every Hamming-1 neighbor
# bucket — query-side fan-out instead of corpus-side table fan-out
# (the corpus is hashed and shuffled ONCE). Faithful-candidate
# oracle: the probe-set generation (per-bit sign flips) is mirrored
# bit-for-bit, so the gate is deterministic; recall vs exact is the
# adjacent q_ann_* recall-witness pattern.
# ---------------------------------------------------------------------------
_MP_PLANES = 6


def _mp_flip_sql(i: int) -> str:
    return (
        f"substr(bucket, 1, {i - 1}) || "
        f"(CASE substr(bucket, {i}, 1) WHEN '1' THEN '0' ELSE '1' END)"
        f" || substr(bucket, {i + 1}, {_MP_PLANES})"
    )


@register(
    "q_ann_multiprobe",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(_MP_PLANES)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    buckets AS (
      SELECT vec_id, string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id
    ),
    qprobes AS (
      SELECT vec_id, bucket FROM buckets WHERE vec_id < 3
      {"".join(f" UNION SELECT vec_id, {_mp_flip_sql(i)} AS bucket FROM buckets WHERE vec_id < 3" for i in range(1, _MP_PLANES + 1))}
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qprobes q JOIN buckets c ON q.bucket = c.bucket
      WHERE c.vec_id <> q.vec_id
    ),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    dots AS (
      SELECT query_id, neighbor_id, SUM(a.e * b.e) AS dot
      FROM pairs
      JOIN fixed a ON a.vec_id = query_id
      JOIN fixed b ON b.vec_id = neighbor_id AND b.i = a.i
      GROUP BY query_id, neighbor_id
    ),
    cos AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      FROM dots
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM cos
    ) ranked WHERE rn <= 5
    """,
)
def q_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ops.multiprobe_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding",
        k=5, num_planes=_MP_PLANES,
    )


# ---------------------------------------------------------------------------
# Ranking quality: NDCG@5 of the multi-probe LSH ranking against the
# exact brute-force ideal (binary relevance: neighbor in the exact
# top-5). Completes the IR-metric family (recall@k, MRR) with the
# position-discounted view. Each 1/log2(rank+1) gain is quantized to
# micros BEFORE summing, and the final ratio is micros-quantized —
# exact integers everywhere but one log2 per rank (the q_kl_source
# idiom). Ideal DCG = the same gains over the first min(|exact|, 5)
# positions.
# ---------------------------------------------------------------------------
@register(
    "q_ann_ndcg",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    norms AS (SELECT vec_id, SUM(e * e) AS n2 FROM fixed GROUP BY vec_id),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(_MP_PLANES)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    buckets AS (
      SELECT vec_id, string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id
    ),
    qprobes AS (
      SELECT vec_id, bucket FROM buckets WHERE vec_id < 20
      {"".join(f" UNION SELECT vec_id, {_mp_flip_sql(i)} AS bucket FROM buckets WHERE vec_id < 20" for i in range(1, _MP_PLANES + 1))}
    ),
    cpairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qprobes q JOIN buckets c ON q.bucket = c.bucket
      WHERE c.vec_id <> q.vec_id
    ),
    epairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    ),
    alldots AS (
      SELECT query_id, neighbor_id, SUM(a.e * b.e) AS dot
      FROM epairs
      JOIN fixed a ON a.vec_id = query_id
      JOIN fixed b ON b.vec_id = neighbor_id AND b.i = a.i
      GROUP BY query_id, neighbor_id
    ),
    allcos AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      FROM alldots
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON neighbor_id = nc.vec_id
    ),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM allcos
      ) WHERE rn <= 5
    ),
    approx5 AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT a.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.query_id
                                  ORDER BY a.cosine DESC, a.neighbor_id) AS rn
        FROM allcos a JOIN cpairs USING (query_id, neighbor_id)
      ) WHERE rn <= 5
    ),
    dcg AS (
      SELECT a.query_id,
             SUM(CASE WHEN e.neighbor_id IS NOT NULL
                      THEN CAST(FLOOR(1000000 / log2(a.rn + 1) + 0.5) AS BIGINT)
                      ELSE 0 END) AS dcg_micros
      FROM approx5 a
      LEFT JOIN exact5 e ON e.query_id = a.query_id
                        AND e.neighbor_id = a.neighbor_id
      GROUP BY a.query_id
    ),
    ideal AS (
      SELECT query_id,
             SUM(CAST(FLOOR(1000000 / log2(rn + 1) + 0.5) AS BIGINT)) AS idcg_micros
      FROM (
        SELECT query_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY neighbor_id) AS rn
        FROM exact5
      ) WHERE rn <= 5
      GROUP BY query_id
    )
    SELECT i.query_id,
           CAST(COALESCE(d.dcg_micros, 0) AS BIGINT) AS dcg_micros,
           CAST(i.idcg_micros AS BIGINT) AS idcg_micros,
           CAST(FLOOR(COALESCE(d.dcg_micros, 0) * 1000000.0 / i.idcg_micros + 0.5) AS BIGINT) AS ndcg_micros
    FROM ideal i LEFT JOIN dcg d USING (query_id)
    """,
)
def q_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = ann_ops.brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ann_ops.multiprobe_topk(
        emb, queries, "vec_id", "embedding", k=5, num_planes=_MP_PLANES
    )
    gain = F.floor(
        F.lit(1_000_000) / F.log2(F.col("rank") + 1) + F.lit(0.5)
    ).cast("long")
    hits = approx.join(
        exact.select("query_id", "neighbor_id").withColumn("rel", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    dcg = hits.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("rel").isNotNull(), gain).otherwise(F.lit(0))
        ).alias("dcg_micros")
    )
    ideal = (
        exact.select(
            "query_id",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy("neighbor_id")
            )
            .alias("rank"),
        )
        .filter(F.col("rank") <= 5)
        .groupBy("query_id")
        .agg(F.sum(gain).alias("idcg_micros"))
    )
    return ideal.join(dcg, "query_id", "left").select(
        "query_id",
        F.coalesce("dcg_micros", F.lit(0)).cast("long").alias("dcg_micros"),
        F.col("idcg_micros").cast("long").alias("idcg_micros"),
        F.floor(
            F.coalesce("dcg_micros", F.lit(0)) * F.lit(1_000_000.0)
            / F.col("idcg_micros")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ndcg_micros"),
    )


# Quantitative recall witness for the SemDeDup tier (the
# q_embed_lsh_recall pattern): on a small deterministic subset
# (vec_id < 200 + perturbed copies), compare the within-cluster pair
# set against the EXACT all-pairs threshold cosine. Both sides are
# modeled in the oracle — the exact side as the all-pairs join, the
# cluster side bit-for-bit — so the metric itself is deterministic
# and gate-checkable. Pairs split across codebook cells are the
# tier's only loss; this measures it.
_SEM_SMALL_SQL = _emb_corpus_sql("WHERE vec_id < 200")


@register(
    "q_semdedup_recall",
    f"""
    WITH exact AS ({_emb_exact_oracle(_SEM_SMALL_SQL)}),
    cl AS (
      SELECT id_a, id_b FROM (
        {_semdedup_oracle("SELECT id_a, id_b FROM sim", _SEM_SMALL_SQL)}
      )
    )
    SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM exact JOIN cl USING (id_a, id_b)) AS n_found,
           CAST((SELECT COUNT(*) FROM exact JOIN cl USING (id_a, id_b)) AS DOUBLE)
             / (SELECT COUNT(*) FROM exact) AS recall
    """,
)
def q_semdedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    subset = _with_perturbed_copies(emb)
    exact = embed_ops.cosine_pairs(subset, "vec_id", "embedding", 0.9)
    cl = sem_ops.semdedup_pairs(
        subset, "vec_id", "embedding",
        n_centroids=_SEM_K, threshold=_SEM_TAU, max_cluster=_SEM_MAX_CLUSTER,
    ).select("id_a", "id_b")
    found = exact.join(cl, ["id_a", "id_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    return n_exact.crossJoin(F.broadcast(n_found)).select(
        "n_exact",
        "n_found",
        (F.col("n_found").cast("double") / F.col("n_exact").cast("double")).alias(
            "recall"
        ),
    )


# The partition the k-center traversal induces: every corpus vector
# assigned to its nearest selected center (ties to the lowest center
# index) — (center_idx, n_points, sum_dist2). The oracle extends the
# unrolled-CTE trace: per-center distance relations m1/d2..d{k-1}
# joined once per vector, argmin via an in-order CASE (first match =
# lowest index). Spark side = ONE scan with the centers as a literal
# matrix (similarity/coreset.py assign_to_centers).
def _kcenter_assign_oracle(k: int) -> str:
    base = _kcenter_oracle(k)
    # reuse the full CTE chain; strip its final UNION-ALL select, and
    # add the LAST selected center's distance relation (the trace
    # chain only needs dists to centers 0..k-2 — assignment needs all k)
    ctes = base[: base.index("SELECT CAST(0 AS BIGINT) AS round")]
    ctes += f""",
    c{k} AS MATERIALIZED (
      SELECT i, e FROM fixed WHERE vec_id = (SELECT vec_id FROM s{k - 1})
    ),
    d{k} AS MATERIALIZED (
      SELECT a.vec_id, SUM((a.e - b.e) * (a.e - b.e)) AS d2
      FROM fixed a JOIN c{k} b ON a.i = b.i
      GROUP BY a.vec_id
    )"""
    dist_cols = ["m1.mind"] + [f"d{r}.d2" for r in range(2, k + 1)]
    joins = "".join(
        f" JOIN d{r} ON d{r}.vec_id = m1.vec_id" for r in range(2, k + 1)
    )
    least = "LEAST(" + ", ".join(dist_cols) + ")"
    case = "CASE " + " ".join(
        f"WHEN {c} = best THEN {i}" for i, c in enumerate(dist_cols)
    ) + " END"
    return f"""{ctes},
    alld AS (
      SELECT m1.vec_id, {", ".join(f"{c} AS c{i}" for i, c in enumerate(dist_cols))},
             {least} AS best
      FROM m1{joins}
    ),
    assigned AS (
      SELECT vec_id, best AS dist2,
             {"CASE " + " ".join(f"WHEN c{i} = best THEN {i}" for i in range(len(dist_cols))) + " END"} AS center_idx
      FROM alld
    )
    SELECT CAST(center_idx AS BIGINT) AS center_idx,
           COUNT(*) AS n_points,
           CAST(SUM(dist2) AS BIGINT) AS sum_dist2
    FROM assigned GROUP BY center_idx
    """


@register("q_kcenter_assign", _kcenter_assign_oracle(_KC_K))
def q_kcenter_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity import coreset as coreset_ops

    emb = load_table(spark, sf_dir, "embeddings")
    trace = coreset_ops.kcenter_select(emb, "vec_id", "embedding", k=_KC_K)
    fixed = embed_ops._fixed(emb, "vec_id", "embedding")
    by_id = {r["vid"]: list(r["fvec"]) for r in
             fixed.filter(F.col("vid").isin([i for _, i, _ in trace])).collect()}
    centers = [by_id[i] for _, i, _ in trace]
    assigned = coreset_ops.assign_to_centers(emb, "vec_id", "embedding", centers)
    return assigned.groupBy("center_idx").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist2").cast("long").alias("sum_dist2"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation selection: Gopher-gate the corpus (the
# q_gopher_quality triple: word count / mean word length / alpha
# fraction), then DSIR-score the SURVIVORS against the lang='en'
# target fitted ON the gated corpus, and select the top-50 — the
# gate→score→select composition a curation run actually executes
# (garbage never contaminates the importance models). One nested
# oracle; all the determinism devices of the component queries.
# ---------------------------------------------------------------------------
@register(
    "q_curate_select",
    f"""
    WITH m AS (
      SELECT doc_id, lang, text,
             len({_TOKENS_SQL}) AS n_words,
             length(replace({_NORM_SQL}, ' ', '')) AS word_chars,
             len(list_filter({_TOKENS_SQL}, t -> regexp_matches(t, '[a-z]')))
               AS alpha_words
      FROM documents
    ), gated AS (
      SELECT doc_id, lang, text FROM m
      WHERE n_words BETWEEN 25 AND 100000
        AND {_MICROS_SQL.format(expr='word_chars * 1.0 / n_words')}
            BETWEEN 3000000 AND 10000000
        AND {_MICROS_SQL.format(expr='alpha_words * 1.0 / n_words')}
            >= 800000
    ), tok AS (
      SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM gated
    ), tk AS (
      SELECT doc_id, lang,
             {hash60_sql("term", "dsir")} % {_DSIR_B} AS bucket
      FROM tok WHERE term <> ''
    ), db AS (
      SELECT doc_id, lang, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3
    ), cr AS (
      SELECT bucket, SUM(c) AS cr FROM db GROUP BY bucket
    ), ct AS (
      SELECT bucket, SUM(c) AS ct FROM db WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
      SELECT SUM(c) AS nr,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt
      FROM db
    ), lam AS (
      SELECT cr.bucket,
             CAST(FLOOR(ln(
               (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                  * (CAST(tot.nr AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
               / (CAST(cr.cr + 1 AS DOUBLE)
                  * (CAST(tot.nt AS DOUBLE) + CAST({_DSIR_B} AS DOUBLE)))
             ) * 1000000000 + 0.5) AS BIGINT) AS lam_nanos
      FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket CROSS JOIN tot
    ), s AS (
      SELECT doc_id, SUM(c * lam_nanos) AS logw_nanos
      FROM db JOIN lam USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, CAST(logw_nanos AS BIGINT) AS logw_nanos
    FROM s ORDER BY logw_nanos DESC, doc_id LIMIT 50
    """,
)
def q_curate_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    norm = text_fns.normalize(text)
    toks = text_fns.tokens(text)
    n_words = F.size(toks).cast("long")
    word_chars = F.length(F.replace(norm, F.lit(" "), F.lit("")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    gate = (
        n_words.between(25, 100000)
        & _micros(word_chars.cast("double") / n_words).between(
            3000000, 10000000
        )
        & (_micros(alpha_words.cast("double") / n_words) >= 800000)
    )
    gated = docs.filter(gate).select("doc_id", "lang", "text")
    return dsir_ops.dsir_select(
        gated, "doc_id", "text", F.col("lang") == "en",
        k=50, n_buckets=_DSIR_B,
    )


# ---------------------------------------------------------------------------
# Oracle-exact HyperLogLog (operators/sketches.py hll_cells;
# Flajolet et al. 2007): the register relation over event users is
# reproducible bit-for-bit in DuckDB (portable md5 hash60; bin()
# strips leading zeros identically in both engines), so — unlike the
# engine-native q_approx_distinct, which stays rows-only by design —
# the stored, MERGEABLE sketch itself is value-gated, the same
# upgrade the Count-Min sketch got in round 6. q_hll_estimate checks
# the raw estimator (exact dyadic 2^-rho sums; one closing division)
# against the true distinct count.
# ---------------------------------------------------------------------------
@register(
    "q_hll_cells",
    f"""
    WITH h AS (
      SELECT {hash60_sql("CAST(user_id AS VARCHAR)", "hll")} AS h FROM events
    ), keyed AS (
      SELECT h % 64 AS bucket, (h - (h % 64)) // 64 AS rem FROM h
    )
    SELECT bucket,
           CAST(MAX(CASE WHEN rem = 0 THEN 55
                         ELSE 54 - length(bin(rem)) + 1 END) AS INT) AS max_rho
    FROM keyed GROUP BY bucket
    """,
)
def q_hll_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import hll_cells

    ev = load_table(spark, sf_dir, "events")
    return hll_cells(ev, "user_id").select(
        "bucket", F.col("max_rho").cast("int").alias("max_rho")
    )


@register(
    "q_hll_estimate",
    f"""
    WITH h AS (
      SELECT {hash60_sql("CAST(user_id AS VARCHAR)", "hll")} AS h FROM events
    ), keyed AS (
      SELECT h % 64 AS bucket, (h - (h % 64)) // 64 AS rem FROM h
    ), cells AS (
      SELECT bucket,
             MAX(CASE WHEN rem = 0 THEN 55
                      ELSE 54 - length(bin(rem)) + 1 END) AS max_rho
      FROM keyed GROUP BY bucket
    ), agg AS (
      SELECT SUM(power(2.0, -max_rho)) AS z, COUNT(*) AS nb FROM cells
    )
    , r AS (
      SELECT {0.709 * 64 * 64} / (z + CAST(64 - nb AS DOUBLE)) AS raw,
             CAST(64 - nb AS DOUBLE) AS empty, nb
      FROM agg
    )
    SELECT CAST(FLOOR(CASE WHEN raw <= {2.5 * 64} AND empty > 0
                           THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / empty)
                           ELSE raw END * 1000000 + 0.5) AS BIGINT) AS est_micros,
           CAST(FLOOR(raw * 1000000 + 0.5) AS BIGINT) AS raw_micros,
           CAST(64 - nb AS BIGINT) AS n_empty,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct
    FROM r
    """,
)
def q_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import hll_cells, hll_estimate

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(hll_cells(ev, "user_id"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Oracle-exact Bloom filter audit (operators/sketches.py bloom_bits/
# bloom_probe; Bloom 1970): build over customer keys, probe an
# equal-sized ABSENT key range (custkey + 10^9 — guaranteed outside
# every SF's key space), and report present-recall (must be total —
# Bloom has no false negatives) plus the OBSERVED false-positive
# count, which is fully deterministic given the md5 positions and so
# value-gated, not a statistical assertion.
# ---------------------------------------------------------------------------
_BF_PROBE_SQL = """
  SELECT c_custkey AS key, 1 AS present FROM customer
  UNION ALL
  SELECT c_custkey + 1000000000 AS key, 0 AS present FROM customer
"""


@register(
    "q_bloom_fpr",
    f"""
    WITH keys AS (SELECT DISTINCT c_custkey AS k FROM customer),
    bits AS (
      SELECT DISTINCT unnest([{",".join(f"{hash60_sql('CAST(k AS VARCHAR)', f'bf{j}')} % 131072" for j in range(7))}]) AS pos
      FROM keys
    ),
    probes AS ({_BF_PROBE_SQL}),
    ppos AS (
      SELECT key, present,
             unnest([{",".join(f"{hash60_sql('CAST(key AS VARCHAR)', f'bf{j}')} % 131072" for j in range(7))}]) AS pos
      FROM probes
    ),
    hits AS (
      SELECT key, present, COUNT(bits.pos) AS nset
      FROM ppos LEFT JOIN bits USING (pos)
      GROUP BY key, present
    )
    SELECT CAST(SUM(CASE WHEN present = 1 AND nset = 7 THEN 1 ELSE 0 END) AS BIGINT) AS present_found,
           CAST(SUM(present) AS BIGINT) AS present_total,
           CAST(SUM(CASE WHEN present = 0 AND nset = 7 THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           CAST(SUM(1 - present) AS BIGINT) AS absent_total
    FROM hits
    """,
)
def q_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import bloom_bits, bloom_probe

    cust = load_table(spark, sf_dir, "customer")
    bits = bloom_bits(cust.select("c_custkey").distinct(), "c_custkey")
    probes = cust.select(
        F.col("c_custkey").alias("key"), F.lit(1).alias("present")
    ).unionAll(
        cust.select(
            (F.col("c_custkey") + 1_000_000_000).alias("key"),
            F.lit(0).alias("present"),
        )
    )
    res = bloom_probe(probes, bits, "key").join(
        probes, "key"
    )
    return res.agg(
        F.sum(
            F.when((F.col("present") == 1) & F.col("maybe_present"), 1).otherwise(0)
        ).cast("long").alias("present_found"),
        F.sum("present").cast("long").alias("present_total"),
        F.sum(
            F.when((F.col("present") == 0) & F.col("maybe_present"), 1).otherwise(0)
        ).cast("long").alias("false_positives"),
        F.sum(1 - F.col("present")).cast("long").alias("absent_total"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (functions/winnow.py; Schleimer, Wilkerson
# & Aiken SIGMOD'03 — the MOSS algorithm): per-window minimum gram
# hash with the paper's rightmost tie rule, encoded so the selection
# is ONE integer min (hash*w + w-1-offset) and the decode an exact
# bit shift. q_winnow audits per-doc selection (count + min
# fingerprint; density ~2/(w+1) of grams); q_winnow_matches runs the
# MOSS use — shared-fingerprint pairs over planted near-copies via
# the standard posting-list + max_df shape. Full oracles.
# ---------------------------------------------------------------------------
def _winnow_sel_sql(corpus: str) -> str:
    h = hash60_sql("g", "win")
    # fingerprint key = 40-bit gram hash * 2^20 + (2^20-1 - global
    # gram position): min key = min hash, tie = rightmost occurrence;
    # the GLOBAL position makes adjacent windows that pick the same
    # occurrence contribute one fingerprint (the density invariant)
    return f"""
    tok AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM ({corpus})),
    gr AS (
      SELECT doc_id,
             list_transform(
               list_transform(range(1, len(toks) - 1),
                              i -> array_to_string(toks[i:i+2], ' ')),
               g -> {h} % 1099511627776) AS hs
      FROM tok WHERE len(toks) >= 3
    ),
    sel AS (
      SELECT doc_id, len(hs) AS n_grams,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               i -> list_min(list_transform(
                      range(0, least(4, len(hs) - i + 1)),
                      off -> hs[CAST(i + off AS INT)] * 1048576
                             + (1048575 - (i + off))))
             )) AS keys
      FROM gr
    )"""


@register(
    "q_winnow",
    f"""
    WITH {_winnow_sel_sql("SELECT doc_id, text FROM documents")}
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(keys) AS BIGINT) AS n_fps,
           CAST(list_min(list_transform(keys, k -> k // 1048576)) AS BIGINT) AS min_fp
    FROM sel
    """,
)
def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions import winnow as win_fns

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    keys = win_fns.winnow_keys_rows(
        docs, "doc_id", "text", with_counts=True
    )
    return keys.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("n_fps"),
        F.min(F.shiftright(F.col("key"), 20)).alias("min_fp"),
    ).select("doc_id", "n_grams", "n_fps", "min_fp")


@register(
    "q_winnow_matches",
    f"""
    WITH {_winnow_sel_sql(f"SELECT doc_id, text FROM ({_NEAR_CORPUS_SQL}) WHERE doc_id % 1000000 < 200")},
    fps AS (
      SELECT doc_id, unnest(list_transform(keys, k -> k // 1048576)) AS fp FROM sel
    ),
    posting AS (
      SELECT fp, list(DISTINCT doc_id ORDER BY doc_id) AS ds
      FROM fps GROUP BY fp
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM (SELECT fp, unnest(ds) AS doc_id FROM posting) a
      JOIN (SELECT fp, unnest(ds) AS doc_id FROM posting) b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared
    FROM pairs WHERE shared >= 3
    """,
)
def q_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions import winnow as win_fns

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    corpus = _with_near_copies(docs)
    fps = win_fns.winnow_keys_rows(corpus, "doc_id", "text").select(
        "doc_id", F.shiftright(F.col("key"), 20).alias("fp")
    )
    posting = (
        fps.distinct()
        .groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= 64))
    )
    expand = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        posting.select(F.explode(expand).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 3)
        .select("doc_a", "doc_b", F.col("shared").cast("long").alias("shared"))
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch (operators/sketches.py kmv_*; Bar-Yossef 2002,
# Beyer SIGMOD'07): the fourth oracle-exact sketch. q_kmv_users
# value-gates the stored sketch's estimate against the true distinct
# count; q_kmv_overlap estimates the Jaccard of two user populations
# (click vs purchase events) from the bottom-k of the union —
# the cross-dataset overlap job HLL cannot do without
# inclusion-exclusion. All integers except one closing division.
# ---------------------------------------------------------------------------
@register(
    "q_kmv_users",
    f"""
    WITH s AS (
      SELECT DISTINCT {hash60_sql("CAST(user_id AS VARCHAR)", "kmv")} AS h
      FROM events ORDER BY h LIMIT 256
    ), agg AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM s)
    SELECT CAST(FLOOR(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                           ELSE {float(255)} * {float(1 << 60)} / CAST(hk AS DOUBLE)
                      END * 1000000 + 0.5) AS BIGINT) AS est_micros,
           CAST(n AS BIGINT) AS n_in_sketch,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct
    FROM agg
    """,
)
def q_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import kmv_estimate, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    est = kmv_estimate(kmv_sketch(ev, "user_id"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact))


@register(
    "q_kmv_overlap",
    f"""
    WITH a AS (
      SELECT DISTINCT {hash60_sql("CAST(user_id AS VARCHAR)", "kmv")} AS h
      FROM events WHERE user_id % 4 < 3 ORDER BY h LIMIT 256
    ), b AS (
      SELECT DISTINCT {hash60_sql("CAST(user_id AS VARCHAR)", "kmv")} AS h
      FROM events WHERE user_id % 4 > 0 ORDER BY h LIMIT 256
    ), uk AS (
      SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
      ORDER BY h LIMIT 256
    ), nb AS (
      SELECT COUNT(*) AS n_both FROM uk
      WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
    ), nu AS (SELECT COUNT(*) AS n_union_k FROM uk),
    ex AS (
      SELECT CAST(FLOOR(
        (SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM events WHERE user_id % 4 < 3
           INTERSECT
           SELECT DISTINCT user_id FROM events WHERE user_id % 4 > 0))
        * 1000000.0
        / (SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM events WHERE user_id % 4 < 3
           UNION
           SELECT DISTINCT user_id FROM events WHERE user_id % 4 > 0))
        + 0.5) AS BIGINT) AS exact_jaccard_micros
    )
    SELECT CAST(n_union_k AS BIGINT) AS n_union_k,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(FLOOR(CAST(n_both AS DOUBLE) / CAST(n_union_k AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS jaccard_micros,
           exact_jaccard_micros
    FROM nu CROSS JOIN nb CROSS JOIN ex
    """,
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import kmv_jaccard, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    # two deterministic 75% user populations with a planted 50%
    # Jaccard (id % 4 < 3 vs id % 4 > 0) — natural splits of the
    # synthetic corpus all give ~1.0 (every user does everything)
    clicks = ev.filter(F.col("user_id") % 4 < 3).select("user_id")
    buys = ev.filter(F.col("user_id") % 4 > 0).select("user_id")
    a = kmv_sketch(clicks, "user_id")
    b = kmv_sketch(buys, "user_id")
    est = kmv_jaccard(a, b)
    inter = clicks.distinct().join(buys.distinct(), "user_id", "left_semi").agg(
        F.count(F.lit(1)).alias("ni")
    )
    uni = clicks.union(buys).distinct().agg(F.count(F.lit(1)).alias("nu"))
    exact = inter.crossJoin(F.broadcast(uni)).select(
        F.floor(
            F.col("ni") * F.lit(1_000_000.0) / F.col("nu") + F.lit(0.5)
        )
        .cast("long")
        .alias("exact_jaccard_micros")
    )
    return est.crossJoin(F.broadcast(exact))


# Threshold-sensitivity curve for the semantic tier (the q_dedup_curve
# sibling the minhash family carries): pairs and distinct drops at
# tau per-mille in {800, 850, 900, 950}, all derived from ONE
# within-cluster pair relation at the loosest threshold — the tuning
# table a curation run reads before fixing tau. The cluster-bounded
# candidate shape (and its max_cluster guard) is unchanged; only the
# closing filter sweeps. tau stays an integer column so the group key
# never hashes a float.
_SEM_CURVE_FINAL = """
    , scored AS (
      SELECT id_b,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      FROM pairdots
      JOIN norms na ON id_a = na.vec_id
      JOIN norms nb ON id_b = nb.vec_id
    ), taus(tau_milli) AS (VALUES (800), (850), (900), (950))
    SELECT t.tau_milli,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT s.id_b) AS n_dropped
    FROM taus t JOIN scored s
      ON s.cosine >= CAST(t.tau_milli AS DOUBLE) / 1000
    GROUP BY t.tau_milli
"""


@register("q_semdedup_curve", _semdedup_oracle(_SEM_CURVE_FINAL, tau=0.80))
def q_semdedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = sem_ops.semdedup_pairs(
        _sem_corpus(spark, sf_dir), "vec_id", "embedding",
        n_centroids=_SEM_K, threshold=0.80, max_cluster=_SEM_MAX_CLUSTER,
    )
    taus = spark.createDataFrame(
        [(800,), (850,), (900,), (950,)], "tau_milli int"
    )
    return (
        pairs.crossJoin(F.broadcast(taus))
        .filter(F.col("cosine") >= F.col("tau_milli").cast("double") / 1000)
        .groupBy("tau_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("id_b").cast("long").alias("n_dropped"),
        )
    )


# Planted-truth evaluation of the edit join (the recall-witness
# pattern every approximate tier carries): the md5 corpus construction
# makes the TRUE pair set derivable — for every sampled custkey the
# base, 1-deletion, and 2-deletion variants are pairwise within
# levenshtein 2 (verified, not assumed: the oracle recomputes the
# distance), so precision/recall of the prefix-filtered join are
# deterministic integers. Natural md5 collisions (pairs outside the
# planted triplets) count toward found-but-not-planted, so precision
# is reported against VERIFIED pairs, recall against the planted set.
@register(
    "q_edit_join_eval",
    f"""
    WITH base AS (
      SELECT substr(md5('ed#' || CAST(c_custkey AS VARCHAR)), 1, 16) AS s
      FROM customer WHERE c_custkey % 7 = 0
    ),
    truth AS (
      SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM (
        SELECT s AS x, substr(s, 1, 8) || substr(s, 10, len(s)) AS y FROM base
        UNION
        SELECT s AS x,
               substr(s, 1, 3) || substr(s, 5, 4) || substr(s, 10, len(s)) AS y
        FROM base
        UNION
        SELECT substr(s, 1, 8) || substr(s, 10, len(s)) AS x,
               substr(s, 1, 3) || substr(s, 5, 4) || substr(s, 10, len(s)) AS y
        FROM base
      ) WHERE x <> y AND levenshtein(x, y) <= 2
    ),
    found AS (SELECT a, b FROM ({ORACLES["q_edit_join"]}))
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM found) AS n_found,
           (SELECT COUNT(*) FROM truth JOIN found USING (a, b)) AS n_hit,
           CAST(FLOOR((SELECT COUNT(*) FROM truth JOIN found USING (a, b))
                      * 1000000.0 / (SELECT COUNT(*) FROM truth) + 0.5) AS BIGINT)
             AS recall_micros
    """,
)
def q_edit_join_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    found = edit_ops.qgram_edit_pairs(
        _edit_corpus(spark, sf_dir), "s", k=2, q=3
    ).select("a", "b")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    )
    s = F.substring(
        F.md5(F.concat(F.lit("ed#"), F.col("c_custkey").cast("string"))), 1, 16
    )
    d1 = F.concat(s.substr(F.lit(1), F.lit(8)), s.substr(F.lit(10), F.length(s)))
    d2 = F.concat(
        s.substr(F.lit(1), F.lit(3)),
        s.substr(F.lit(5), F.lit(4)),
        s.substr(F.lit(10), F.length(s)),
    )
    cand = (
        cust.select(s.alias("x"), d1.alias("y"))
        .union(cust.select(s.alias("x"), d2.alias("y")))
        .union(cust.select(d1.alias("x"), d2.alias("y")))
        .distinct()
    )
    truth = (
        cand.filter(
            (F.col("x") != F.col("y")) & (F.levenshtein("x", "y") <= 2)
        )
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    n_hit = truth.join(found, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_true.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_true",
            "n_found",
            "n_hit",
            F.floor(
                F.col("n_hit") * F.lit(1_000_000.0) / F.col("n_true") + F.lit(0.5)
            )
            .cast("long")
            .alias("recall_micros"),
        )
    )


# HLL merge under the oracle gate: per-source register relations
# merged by re-max (the sink's read path) must estimate the UNION of
# the sources — the property that makes HLL the distributed distinct
# counter. Sources partition the corpus, so the merged estimate is
# checked against the overall exact count; the per-source relations,
# the merge, and the corrected estimator all replay in the oracle.
@register(
    "q_hll_union",
    f"""
    WITH h AS (
      SELECT event_type,
             {hash60_sql("CAST(user_id AS VARCHAR)", "hll")} AS h
      FROM events
    ), keyed AS (
      SELECT event_type, h % 64 AS bucket, (h - (h % 64)) // 64 AS rem FROM h
    ), percells AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rem = 0 THEN 55
                      ELSE 54 - length(bin(rem)) + 1 END) AS max_rho
      FROM keyed GROUP BY event_type, bucket
    ), cells AS (
      SELECT bucket, MAX(max_rho) AS max_rho FROM percells GROUP BY bucket
    ), agg AS (
      SELECT SUM(power(2.0, -max_rho)) AS z, COUNT(*) AS nb FROM cells
    ), r AS (
      SELECT {0.709 * 64 * 64} / (z + CAST(64 - nb AS DOUBLE)) AS raw,
             CAST(64 - nb AS DOUBLE) AS empty, nb
      FROM agg
    )
    SELECT CAST(FLOOR(CASE WHEN raw <= {2.5 * 64} AND empty > 0
                           THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / empty)
                           ELSE raw END * 1000000 + 0.5) AS BIGINT) AS est_micros,
           (SELECT COUNT(DISTINCT event_type) FROM events) AS n_sketches,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct
    FROM r
    """,
)
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import hll_cells, hll_estimate, hll_merge

    ev = load_table(spark, sf_dir, "events")
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    sketches = [
        hll_cells(ev.filter(F.col("event_type") == t), "user_id")
        for t in sorted(types)
    ]
    est = hll_estimate(hll_merge(*sketches)).select("est_micros")
    meta = ev.agg(
        F.countDistinct("event_type").cast("long").alias("n_sketches"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    return est.crossJoin(F.broadcast(meta))


# Query-likelihood retrieval with Dirichlet smoothing (Zhai &
# Lafferty SIGIR'01) — the language-modeling sibling of q_bm25 over
# the same query terms: score(q,d) = sum_t ln((tf + mu*p(t|C)) /
# (dl + mu)), mu = 2000. EVERY document scores (absent terms smooth
# to the collection probability), so the full ranking is value-gated,
# not just the matching docs. Per-term micros quantization before the
# sum (the q_kl_source idiom); collection stats are 1-row/terms-row
# bounded broadcasts.
@register(
    "q_lm_dirichlet",
    f"""
    WITH docs AS (
      SELECT doc_id, len({_TOKENS_SQL}) AS dl,
             list_filter({_TOKENS_SQL}, t -> t IN ({_BM25_TERMS_SQL})) AS qt
      FROM documents
    ), stats AS (
      SELECT SUM(dl) AS total_len FROM docs
    ), tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(qt) AS term FROM docs
      ) GROUP BY 1, 2
    ), ctf AS (
      SELECT term, SUM(tf) AS ctf FROM tfc GROUP BY term
    ), terms AS (SELECT unnest([{_BM25_TERMS_SQL}]) AS term),
    grid AS (
      SELECT d.doc_id, d.dl, t.term,
             COALESCE(tfc.tf, 0) AS tf, COALESCE(c.ctf, 0) AS ctf
      FROM docs d
      CROSS JOIN terms t
      LEFT JOIN tfc ON tfc.doc_id = d.doc_id AND tfc.term = t.term
      LEFT JOIN ctf c ON c.term = t.term
    )
    SELECT doc_id, CAST(SUM({_MICROS_SQL.format(expr='''
             ln((tf + 2000.0 * ctf / total_len) / (dl + 2000.0))''')})
           AS BIGINT) AS score_micros
    FROM grid CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def q_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    toks = text_fns.tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        F.filter(toks, lambda t: t.isin(*_BM25_TERMS)).alias("qt"),
    )
    stats = base.agg(F.sum("dl").alias("total_len"))
    tfc = (
        base.select("doc_id", F.explode("qt").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ctf = tfc.groupBy("term").agg(F.sum("tf").alias("ctf"))
    terms = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    grid = (
        base.select("doc_id", "dl")
        .crossJoin(F.broadcast(terms))
        .join(tfc, ["doc_id", "term"], "left")
        .join(F.broadcast(ctf), "term", "left")
        .select(
            "doc_id",
            "dl",
            F.coalesce("tf", F.lit(0)).alias("tf"),
            F.coalesce("ctf", F.lit(0)).alias("ctf"),
        )
    )
    term_micros = _micros(
        F.log(
            (F.col("tf") + F.lit(2000.0) * F.col("ctf") / F.col("total_len"))
            / (F.col("dl") + F.lit(2000.0))
        )
    )
    return (
        grid.crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_micros).cast("long").alias("score_micros"))
    )


# ---------------------------------------------------------------------------
# Classifier comparison: McNemar's test (McNemar 1947) between the
# TRAINED naive Bayes and the FIXED langid heuristic on the held-out
# fifth — the standard paired test for "is classifier A actually
# better than B on the same examples" (discordant pairs only). The
# oracle composes the two registered oracles verbatim: q_nb_confusion's
# CTE chain re-finalized to per-doc predictions, joined against
# q_langid's predictions. b/c counts are exact integers; the
# continuity-corrected statistic closes in one micros-quantized
# expression, nullif-guarded for the no-discordance case.
# ---------------------------------------------------------------------------
_MCNEMAR_FINAL = """
    , lid AS (
      SELECT doc_id, predicted FROM ({LANGID})
    ), paired AS (
      SELECT p.doc_id,
             CASE WHEN l.predicted = p.lang AND p.pred <> p.lang THEN 1 ELSE 0 END AS b,
             CASE WHEN p.pred = p.lang AND l.predicted <> p.lang THEN 1 ELSE 0 END AS c
      FROM pred p JOIN lid l USING (doc_id)
    )
    SELECT CAST(SUM(b) AS BIGINT) AS n_heuristic_only,
           CAST(SUM(c) AS BIGINT) AS n_nb_only,
           CAST(FLOOR(
             (abs(CAST(SUM(b) AS DOUBLE) - CAST(SUM(c) AS DOUBLE)) - 1)
             * (abs(CAST(SUM(b) AS DOUBLE) - CAST(SUM(c) AS DOUBLE)) - 1)
             / nullif(CAST(SUM(b) + SUM(c) AS DOUBLE), 0)
             * 1000000 + 0.5) AS BIGINT) AS mcnemar_micros
    FROM paired
"""


@register(
    "q_mcnemar_nb_vs_langid",
    ORACLES["q_nb_confusion"].replace(
        "SELECT lang, pred, COUNT(*) AS n FROM pred GROUP BY lang, pred",
        _MCNEMAR_FINAL.replace("{LANGID}", ORACLES["q_langid"]),
    ),
)
def q_mcnemar_nb_vs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.langid import language_scores

    docs = core_ops.spread(load_table(spark, sf_dir, "documents"))
    # persisted: one bucketization scan feeds both splits (and the
    # modulo split stays above the materialization instead of being
    # pushed to the scan as a non-eligible predicate)
    db = nb_ops.doc_buckets(
        docs, "doc_id", "text", "lang", n_buckets=_NB_B
    ).persist()
    train_db = db.filter(F.col("_id") % 5 != 0)
    test_db = db.filter(F.col("_id") % 5 == 0)
    lik, stats = nb_ops.nb_fit(train_db, _NB_B)
    nb_pred = nb_ops.nb_predict(test_db, lik, stats).select(
        F.col("_id").alias("doc_id"),
        F.col("_label").alias("lang"),
        "pred",
    )
    lid = language_scores(docs, "doc_id", "text").select(
        "doc_id", F.col("predicted").alias("heur")
    )
    paired = nb_pred.join(lid, "doc_id").select(
        F.when(
            (F.col("heur") == F.col("lang")) & (F.col("pred") != F.col("lang")),
            1,
        )
        .otherwise(0)
        .alias("b"),
        F.when(
            (F.col("pred") == F.col("lang")) & (F.col("heur") != F.col("lang")),
            1,
        )
        .otherwise(0)
        .alias("c"),
    )
    d = F.abs(F.sum("b").cast("double") - F.sum("c").cast("double"))
    return paired.agg(
        F.sum("b").cast("long").alias("n_heuristic_only"),
        F.sum("c").cast("long").alias("n_nb_only"),
        F.floor(
            (d - 1) * (d - 1)
            / F.nullif((F.sum("b") + F.sum("c")).cast("double"), F.lit(0.0))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mcnemar_micros"),
    )




# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer family
# (functions/unigram_lm.py, Kudo 2018 arXiv:1804.10959): the BPE
# trainer's sibling. The seed vocabulary and the Viterbi E-step are
# fully oracled; the iterative trainer itself is witnessed by the
# differential pytest (tests/test_unigram_lm.py), the engine's
# convention for iterative algorithms. The oracle replays the forward
# DP as 12 unrolled MATERIALIZED CTEs (the q_markov_stationary
# pattern) and the backtrace as 12 more, tie-break MIN(j) mirroring
# the Spark backtrace's longest-piece rule.
# ---------------------------------------------------------------------------

def _unigram_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.unigram_lm import word_counts

    return word_counts(load_table(spark, sf_dir, "documents"))


def _unigram_model(words: DataFrame) -> DataFrame:
    """Seed-count model with lp = floor(ln(n/total)*1e6 + 0.5) — the
    relational twin of the trainer's driver-side logp_micros (F.log
    and DuckDB ln are libm-identical on this platform, the
    q_unigram_logprob precedent)."""
    from frames_spark.functions.unigram_lm import seed_pieces

    seed = seed_pieces(words, max_piece_len=4, size=64)
    tot = seed.agg(F.sum("n").cast("double").alias("tot"))
    return seed.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("tot")) * 1000000 + 0.5
        ).cast("long").alias("lp"),
    )


@register(
    "q_unigram_seed",
    f"""
    WITH words AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest({_TOKENS_SQL}) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$') AND length(word) <= 12
      GROUP BY word
    ), subs AS (
      SELECT unnest(flatten(list_transform(range(1, length(word) + 1),
               jp1 -> list_transform(range(1, least(4, length(word) - jp1 + 1) + 1),
                        L -> substring(word, jp1, L))))) AS piece, cnt
      FROM words
    ), counts AS (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM subs GROUP BY piece
    ), top AS (
      SELECT piece, n FROM counts ORDER BY n DESC, piece LIMIT 64
    )
    SELECT piece, n FROM top
    UNION
    SELECT piece, n FROM counts WHERE length(piece) = 1
    """,
)
def q_unigram_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.unigram_lm import seed_pieces

    return seed_pieces(_unigram_words(spark, sf_dir), max_piece_len=4, size=64)


@register(
    "q_unigram_viterbi",
    f"""
    WITH words AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest({_TOKENS_SQL}) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$') AND length(word) <= 12
      GROUP BY word
    ), subs AS (
      SELECT unnest(flatten(list_transform(range(1, length(word) + 1),
               jp1 -> list_transform(range(1, least(4, length(word) - jp1 + 1) + 1),
                        L -> substring(word, jp1, L))))) AS piece, cnt
      FROM words
    ), counts AS (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM subs GROUP BY piece
    ), seed AS (
      SELECT piece, n FROM (SELECT piece, n FROM counts ORDER BY n DESC, piece LIMIT 64)
      UNION
      SELECT piece, n FROM counts WHERE length(piece) = 1
    ), m AS MATERIALIZED (
      SELECT piece,
             CAST(FLOOR(LN(CAST(n AS DOUBLE) / (SELECT CAST(SUM(n) AS DOUBLE) FROM seed)) * 1000000 + 0.5) AS BIGINT) AS lp
      FROM seed
    ), wz AS MATERIALIZED (
      SELECT word, cnt FROM words WHERE cnt >= 3
    ), b1 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 1) WHERE length(w.word) >= 1
      ) GROUP BY word
    ), b2 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 1) WHERE length(w.word) >= 2
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 2) WHERE length(w.word) >= 2
      ) GROUP BY word
    ), b3 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 1) WHERE length(w.word) >= 3
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 2) WHERE length(w.word) >= 3
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 3) WHERE length(w.word) >= 3
      ) GROUP BY word
    ), b4 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 1) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 2) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 3) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 4) WHERE length(w.word) >= 4
      ) GROUP BY word
    ), b5 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 1) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 2) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 3) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 4) WHERE length(w.word) >= 5
      ) GROUP BY word
    ), b6 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 1) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 2) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 3) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 4) WHERE length(w.word) >= 6
      ) GROUP BY word
    ), b7 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 1) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 2) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 3) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 4) WHERE length(w.word) >= 7
      ) GROUP BY word
    ), b8 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 1) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 2) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 3) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 4) WHERE length(w.word) >= 8
      ) GROUP BY word
    ), b9 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 1) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 2) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 3) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 4) WHERE length(w.word) >= 9
      ) GROUP BY word
    ), b10 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 1) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 2) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 3) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 4) WHERE length(w.word) >= 10
      ) GROUP BY word
    ), b11 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b10 b USING (word) JOIN m ON m.piece = substring(w.word, 11, 1) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 2) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 3) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 4) WHERE length(w.word) >= 11
      ) GROUP BY word
    ), b12 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b11 b USING (word) JOIN m ON m.piece = substring(w.word, 12, 1) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b10 b USING (word) JOIN m ON m.piece = substring(w.word, 11, 2) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 3) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 4) WHERE length(w.word) >= 12
      ) GROUP BY word
    )
    SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b1 b USING (word) WHERE length(w.word) = 1
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b2 b USING (word) WHERE length(w.word) = 2
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b3 b USING (word) WHERE length(w.word) = 3
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b4 b USING (word) WHERE length(w.word) = 4
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b5 b USING (word) WHERE length(w.word) = 5
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b6 b USING (word) WHERE length(w.word) = 6
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b7 b USING (word) WHERE length(w.word) = 7
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b8 b USING (word) WHERE length(w.word) = 8
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b9 b USING (word) WHERE length(w.word) = 9
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b10 b USING (word) WHERE length(w.word) = 10
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b11 b USING (word) WHERE length(w.word) = 11
    UNION ALL SELECT w.word, w.cnt, b.best AS best_micros FROM wz w JOIN b12 b USING (word) WHERE length(w.word) = 12
    """,
)
def q_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.unigram_lm import viterbi_best

    words = _unigram_words(spark, sf_dir)
    model = _unigram_model(words)
    return viterbi_best(words.filter(F.col("cnt") >= 3), model).select(
        "word", "cnt", F.col("best").alias("best_micros")
    )


@register(
    "q_unigram_em1",
    f"""
    WITH words AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest({_TOKENS_SQL}) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$') AND length(word) <= 12
      GROUP BY word
    ), subs AS (
      SELECT unnest(flatten(list_transform(range(1, length(word) + 1),
               jp1 -> list_transform(range(1, least(4, length(word) - jp1 + 1) + 1),
                        L -> substring(word, jp1, L))))) AS piece, cnt
      FROM words
    ), counts AS (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM subs GROUP BY piece
    ), seed AS (
      SELECT piece, n FROM (SELECT piece, n FROM counts ORDER BY n DESC, piece LIMIT 64)
      UNION
      SELECT piece, n FROM counts WHERE length(piece) = 1
    ), m AS MATERIALIZED (
      SELECT piece,
             CAST(FLOOR(LN(CAST(n AS DOUBLE) / (SELECT CAST(SUM(n) AS DOUBLE) FROM seed)) * 1000000 + 0.5) AS BIGINT) AS lp
      FROM seed
    ), wz AS MATERIALIZED (
      SELECT word, cnt FROM words WHERE cnt >= 3
    ), b1 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 1) WHERE length(w.word) >= 1
      ) GROUP BY word
    ), b2 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 1) WHERE length(w.word) >= 2
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 2) WHERE length(w.word) >= 2
      ) GROUP BY word
    ), b3 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 1) WHERE length(w.word) >= 3
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 2) WHERE length(w.word) >= 3
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 3) WHERE length(w.word) >= 3
      ) GROUP BY word
    ), b4 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 1) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 2) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 3) WHERE length(w.word) >= 4
        UNION ALL SELECT w.word, m.lp AS v FROM wz w JOIN m ON m.piece = substring(w.word, 1, 4) WHERE length(w.word) >= 4
      ) GROUP BY word
    ), b5 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 1) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 2) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 3) WHERE length(w.word) >= 5
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b1 b USING (word) JOIN m ON m.piece = substring(w.word, 2, 4) WHERE length(w.word) >= 5
      ) GROUP BY word
    ), b6 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 1) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 2) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 3) WHERE length(w.word) >= 6
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b2 b USING (word) JOIN m ON m.piece = substring(w.word, 3, 4) WHERE length(w.word) >= 6
      ) GROUP BY word
    ), b7 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 1) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 2) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 3) WHERE length(w.word) >= 7
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b3 b USING (word) JOIN m ON m.piece = substring(w.word, 4, 4) WHERE length(w.word) >= 7
      ) GROUP BY word
    ), b8 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 1) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 2) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 3) WHERE length(w.word) >= 8
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b4 b USING (word) JOIN m ON m.piece = substring(w.word, 5, 4) WHERE length(w.word) >= 8
      ) GROUP BY word
    ), b9 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 1) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 2) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 3) WHERE length(w.word) >= 9
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b5 b USING (word) JOIN m ON m.piece = substring(w.word, 6, 4) WHERE length(w.word) >= 9
      ) GROUP BY word
    ), b10 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 1) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 2) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 3) WHERE length(w.word) >= 10
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b6 b USING (word) JOIN m ON m.piece = substring(w.word, 7, 4) WHERE length(w.word) >= 10
      ) GROUP BY word
    ), b11 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b10 b USING (word) JOIN m ON m.piece = substring(w.word, 11, 1) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 2) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 3) WHERE length(w.word) >= 11
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b7 b USING (word) JOIN m ON m.piece = substring(w.word, 8, 4) WHERE length(w.word) >= 11
      ) GROUP BY word
    ), b12 AS MATERIALIZED (
      SELECT word, MAX(v) AS best FROM (
        SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b11 b USING (word) JOIN m ON m.piece = substring(w.word, 12, 1) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b10 b USING (word) JOIN m ON m.piece = substring(w.word, 11, 2) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b9 b USING (word) JOIN m ON m.piece = substring(w.word, 10, 3) WHERE length(w.word) >= 12
        UNION ALL SELECT w.word, b.best + m.lp AS v FROM wz w JOIN b8 b USING (word) JOIN m ON m.piece = substring(w.word, 9, 4) WHERE length(w.word) >= 12
      ) GROUP BY word
    ), ball AS MATERIALIZED (
      SELECT word, 0 AS i, CAST(0 AS BIGINT) AS best FROM wz
      UNION ALL SELECT word, 1 AS i, best FROM b1
      UNION ALL SELECT word, 2 AS i, best FROM b2
      UNION ALL SELECT word, 3 AS i, best FROM b3
      UNION ALL SELECT word, 4 AS i, best FROM b4
      UNION ALL SELECT word, 5 AS i, best FROM b5
      UNION ALL SELECT word, 6 AS i, best FROM b6
      UNION ALL SELECT word, 7 AS i, best FROM b7
      UNION ALL SELECT word, 8 AS i, best FROM b8
      UNION ALL SELECT word, 9 AS i, best FROM b9
      UNION ALL SELECT word, 10 AS i, best FROM b10
      UNION ALL SELECT word, 11 AS i, best FROM b11
      UNION ALL SELECT word, 12 AS i, best FROM b12
    ), t0 AS (SELECT word, cnt, length(word) AS pos FROM wz), t1 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t0 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t2 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t1 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t3 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t2 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t4 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t3 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t5 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t4 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t6 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t5 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t7 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t6 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t8 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t7 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t9 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t8 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t10 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t9 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t11 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t10 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    ), t12 AS MATERIALIZED (
      SELECT t.word, t.cnt, MIN(bj.i) AS pos,
             substring(t.word, MIN(bj.i) + 1, t.pos - MIN(bj.i)) AS piece
      FROM t11 t
      JOIN ball bp ON bp.word = t.word AND bp.i = t.pos
      JOIN ball bj ON bj.word = t.word AND bj.i >= t.pos - 4 AND bj.i < t.pos
      JOIN m ON m.piece = substring(t.word, bj.i + 1, t.pos - bj.i)
            AND bj.best + m.lp = bp.best
      WHERE t.pos > 0
      GROUP BY t.word, t.cnt, t.pos
    )
    SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM (
      SELECT piece, cnt FROM t1
      UNION ALL SELECT piece, cnt FROM t2
      UNION ALL SELECT piece, cnt FROM t3
      UNION ALL SELECT piece, cnt FROM t4
      UNION ALL SELECT piece, cnt FROM t5
      UNION ALL SELECT piece, cnt FROM t6
      UNION ALL SELECT piece, cnt FROM t7
      UNION ALL SELECT piece, cnt FROM t8
      UNION ALL SELECT piece, cnt FROM t9
      UNION ALL SELECT piece, cnt FROM t10
      UNION ALL SELECT piece, cnt FROM t11
      UNION ALL SELECT piece, cnt FROM t12
    ) GROUP BY piece
    """,
)
def q_unigram_em1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.unigram_lm import em_counts

    words = _unigram_words(spark, sf_dir)
    model = _unigram_model(words)
    return em_counts(words.filter(F.col("cnt") >= 3), model)


# ---------------------------------------------------------------------------
# Registration order is load-bearing (the driver's first-50 window):
# apply the literal manifest so order is an explicit, reviewable list
# rather than decorator side-effect order. Every registered name must
# appear in the manifest and vice versa — a mismatch is a hard error
# at import, not a silent window shift.
# ---------------------------------------------------------------------------

from frames_spark.registry_order import REGISTRATION_ORDER as _ORDER  # noqa: E402


def _apply_manifest() -> None:
    got, want = set(QUERIES), set(_ORDER)
    if got != want:
        missing = sorted(want - got)
        unlisted = sorted(got - want)
        raise RuntimeError(
            f"registration manifest drift: missing={missing} unlisted={unlisted}"
        )
    ordered = {name: QUERIES[name] for name in _ORDER}
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_manifest()

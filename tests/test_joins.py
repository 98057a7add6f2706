"""Join semantics vs Frames/pandas (benchmarks/pandas_joins.py model:
row counts for all join types on 1 and 2 keys; Joins.hs merged keys +
Maybe null-extension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators import joins
from frames_spark.sources.tables import load_table


def test_inner_join_counts(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = joins.inner_join(o, c, [("o_custkey", "c_custkey")])
    # FK integrity: every order matches exactly one customer
    assert j.count() == o.count()
    # merged key: single o_custkey column, no c_custkey
    assert "c_custkey" not in j.columns and "o_custkey" in j.columns


def test_left_join_null_extension(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n")
    )
    j = joins.left_join(c, stats, ["c_custkey"])
    assert j.count() == c.count()
    without = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).count()
    assert j.filter(F.col("n").isNull()).count() == without


def test_right_equals_flipped_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count("*").alias("n"))
    left = joins.left_join(c, o, ["c_custkey"]).select("c_custkey", "n")
    right = joins.right_join(o, c, ["c_custkey"]).select("c_custkey", "n")
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0


def test_outer_join_union_of_sides(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") <= 10).select("c_custkey", "c_name")
    b = c.filter((F.col("c_custkey") >= 6) & (F.col("c_custkey") <= 15)).select(
        "c_custkey", "c_acctbal"
    )
    full = joins.outer_join(a, b, ["c_custkey"])
    assert full.count() == c.filter(F.col("c_custkey") <= 15).count()
    assert (
        full.filter(F.col("c_name").isNull()).count()
        == c.filter(
            (F.col("c_custkey") > 10) & (F.col("c_custkey") <= 15)
        ).count()
    )
    assert (
        full.filter(F.col("c_acctbal").isNull()).count()
        == c.filter(F.col("c_custkey") < 6).count()
    )


def test_multi_key_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_orderkey", "l_partkey").agg(
        F.count("*").alias("n_lines")
    )
    j = joins.inner_join(li, summary, ["l_orderkey", "l_partkey"])
    assert j.count() == li.count()


def test_semi_anti_partition(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    on = [("c_custkey", "o_custkey")]
    semi = joins.semi_join(c, o, on)
    anti = joins.anti_join(c, o, on)
    assert semi.count() + anti.count() == c.count()
    assert semi.columns == c.columns  # no payload columns leak

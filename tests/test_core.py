"""Core row/column algebra (reference test model: SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators import core
from frames_spark.sources.tables import load_table


def test_project_and_filter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = core.project(
        core.filter_rows(li, F.col("l_quantity") > 45),
        ["l_orderkey", "l_quantity"],
    )
    assert out.columns == ["l_orderkey", "l_quantity"]
    assert out.count() == li.filter("l_quantity > 45").count()
    assert all(r.l_quantity > 45 for r in out.collect())


def test_mutate_and_rename(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    out = core.rename(
        core.mutate(o, doubled=F.col("o_totalprice") * 2),
        {"doubled": "twice"},
    )
    row = out.select("o_totalprice", "twice").first()
    assert row.twice == row.o_totalprice * 2


def test_take_drop_partition(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    order = ["l_orderkey", "l_linenumber", "l_quantity"]
    n = li.count()
    head = core.take_rows(li, 10, order)
    tail = core.drop_rows(li, 10, order)
    assert head.count() == 10
    assert tail.count() == n - 10
    # take ∪ drop is a multiset partition of the frame (rows need not
    # be unique — Exploration.hs contract is positional)
    assert li.exceptAll(head.unionAll(tail)).count() == 0


def test_zip_frames_positional(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    lhs = c.select("c_custkey").limit(0).unionAll(
        c.select("c_custkey")
    )  # plain copy
    zipped = core.zip_frames(
        c.select("c_custkey"),
        c.select(F.col("c_custkey").alias("k2"), "c_name"),
        ["c_custkey"],
        ["k2"],
    )
    assert zipped.count() == c.count()
    # aligned by identical order => keys equal positionally
    assert zipped.filter(F.col("c_custkey") != F.col("k2")).count() == 0
    del lhs


def test_chunked_repartition(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert core.chunked(li, 7).rdd.getNumPartitions() == 7
    assert core.chunked(li, 7).count() == li.count()


def test_preview_returns_text(spark, sf_dir):
    out = core.preview(load_table(spark, sf_dir, "region"), 3)
    assert "r_name" in out


def test_stack_frames_aligns_by_name(spark):
    from frames_spark.operators.core import stack_frames

    a = spark.createDataFrame([(1, "x")], "id: long, s: string")
    b = spark.createDataFrame([("y", 2)], "s: string, id: long")  # reordered
    out = stack_frames([a, b])
    rows = {(r.id, r.s) for r in out.collect()}
    assert rows == {(1, "x"), (2, "y")}  # positional unionAll would garble


def test_stack_frames_missing_columns(spark):
    import pytest
    from frames_spark.operators.core import stack_frames

    a = spark.createDataFrame([(1, "x")], "id: long, s: string")
    c = spark.createDataFrame([(3,)], "id: long")
    with pytest.raises(Exception):
        stack_frames([a, c])  # strict by default
    out = stack_frames([a, c], allow_missing=True)
    rows = {(r.id, r.s) for r in out.collect()}
    assert rows == {(1, "x"), (3, None)}

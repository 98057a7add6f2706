"""Table diff semantics: add/remove/change classification, null
safety, schema drift report."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators.diff import schema_diff, table_diff


def test_diff_classification(spark):
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30)], "id: long, s: string, v: long"
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 99), (4, "w", 40)], "id: long, s: string, v: long"
    )
    got = {r.id: r.change for r in table_diff(a, b, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged: absent


def test_diff_null_safety(spark):
    a = spark.createDataFrame([(1, None, "x")], "id: long, s: string, t: string")
    b = spark.createDataFrame([(1, "x", None)], "id: long, s: string, t: string")
    got = {r.id: r.change for r in table_diff(a, b, ["id"]).collect()}
    assert got == {1: "changed"}  # null-shift must not hash-collide
    same = spark.createDataFrame([(1, None, "x")], "id: long, s: string, t: string")
    assert table_diff(a, same, ["id"]).count() == 0


def test_schema_diff(spark):
    a = spark.createDataFrame([(1, "x")], "id: long, s: string")
    b = spark.createDataFrame([(1, 2, 0.5)], "id: long, s: long, extra: double")
    d = schema_diff(a, b)
    assert d == {"added": ["extra"], "removed": [], "retyped": ["s"]}

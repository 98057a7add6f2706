"""Expectation checks: violations-as-DataFrame semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators import expectations as exp
from frames_spark.plans.explain import formatted_plan, n_parquet_scans
from frames_spark.sources.tables import load_table


def test_duplicate_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    # event_id is the primary key — no duplicates
    assert exp.duplicate_keys(ev, ["event_id"]).count() == 0
    # l_orderkey duplicates (multi-line orders)
    dups = exp.duplicate_keys(li, ["l_orderkey"])
    assert dups.count() > 0
    assert dups.agg(F.min("n_rows")).first()[0] >= 2


def test_orphans_and_integrity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    assert exp.orphans(li, "l_orderkey", o, "o_orderkey").count() == 0
    # planted violation: drop half the parents -> their children orphan
    half = o.filter(F.col("o_orderkey") % 2 == 0)
    orphaned = exp.orphans(li, "l_orderkey", half, "o_orderkey")
    want = li.filter(F.col("l_orderkey") % 2 == 1).count()
    assert orphaned.count() == want


def test_orphans_broadcasts_parent_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plan = formatted_plan(exp.orphans(li, "l_orderkey", o, "o_orderkey"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_out_of_range_and_nulls(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    assert exp.out_of_range(ev, "value", lo=0).count() == 0
    assert exp.out_of_range(ev, "value", hi=-1).count() == n_total
    assert exp.null_violations(ev, ["event_id", "ts"]).count() == 0


def test_profile_single_scan(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    prof = exp.profile(o, ["o_custkey", "o_orderstatus"])
    rows = {r.column: r for r in prof.collect()}
    assert rows["o_custkey"].n_rows == o.count()
    assert rows["o_custkey"].n_null == 0
    assert rows["o_orderstatus"].n_distinct == o.select("o_orderstatus").distinct().count()
    # one scan total, not one per column
    assert n_parquet_scans(prof) == 1

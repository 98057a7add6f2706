"""Range join semantics + plan shape (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from frames_spark.operators.rangejoin import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_range_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01 10:00:00")),
            (2, "u1", _ts("2026-01-01 12:00:00")),
            (3, "u2", _ts("2026-01-01 10:00:00")),
        ],
        "l_id int, user_id string, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2026-01-01 10:30:00")),  # in window of l1
            (11, "u1", _ts("2026-01-01 11:00:00")),  # boundary: == l1+1h
            (12, "u1", _ts("2026-01-01 11:00:01")),  # past l1, before l2 -> no match
            (13, "u1", _ts("2026-01-01 09:59:59")),  # before l1
            (14, "u2", _ts("2026-01-01 10:30:00")),  # other key -> l3 only
        ],
        "r_id int, user_id string, r_ts timestamp",
    )
    out = range_join(left, right, key="user_id",
                     left_ts="l_ts", right_ts="r_ts", window_seconds=3600)
    pairs = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (3, 14)]
    # exactly once per qualifying pair (bucket split must not duplicate)
    assert out.count() == len(set(pairs))


def test_range_join_equi_plan(spark):
    """The bucketed formulation must plan as an equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin."""
    left = spark.range(200).select(
        F.col("id").alias("l_id"),
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 100).alias("l_ts"),
    )
    right = spark.range(300).select(
        F.col("id").alias("r_id"),
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 70).alias("r_ts"),
    )
    out = range_join(left, right, key="k",
                     left_ts="l_ts", right_ts="r_ts", window_seconds=500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # cross-check against the naive range-condition join
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.r_ts") >= F.col("l.l_ts"))
        & (F.unix_timestamp("r.r_ts") <= F.unix_timestamp("l.l_ts") + 500),
        "inner",
    ).select("l.l_id", "r.r_id")
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    want = sorted((r["l_id"], r["r_id"]) for r in naive.collect())
    assert got == want

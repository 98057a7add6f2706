"""As-of join semantics (operators/asof.py).

Mirrors pandas.merge_asof(direction='backward') semantics: for each
left row, the latest right row with ts <= left.ts in the same key
group; ties at equal ts are visible (<=); deterministic tiebreak
among equal-ts right rows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from frames_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01 10:00:00")),  # before any right -> null
            (2, "u1", _ts("2026-01-01 12:00:00")),  # == right ts -> visible
            (3, "u1", _ts("2026-01-01 15:00:00")),  # latest preceding = 14:00
            (4, "u2", _ts("2026-01-01 11:00:00")),  # other key
            (5, "u3", _ts("2026-01-01 11:00:00")),  # key with no right rows
        ],
        "l_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2026-01-01 12:00:00"), 100.0),
            (11, "u1", _ts("2026-01-01 14:00:00"), 200.0),
            (12, "u2", _ts("2026-01-01 10:30:00"), 50.0),
            # equal-ts tie: higher tiebreak (14) must win
            (13, "u2", _ts("2026-01-01 10:30:00"), 60.0),
        ],
        "r_id int, user_id string, ts timestamp, val double",
    )
    right = right.withColumn("r_id", F.col("r_id").cast("int"))

    out = asof_join(
        left, right, key="user_id", ts="ts",
        value_cols=["val"], right_tiebreak="r_id",
    )
    got = {r["l_id"]: r["val"] for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 200.0, 4: 60.0, 5: None}
    # every left row survives exactly once
    assert out.count() == 5


def test_asof_single_shuffle_plan(spark):
    """The union-window formulation must not produce a join at all —
    one Exchange on the key, no CartesianProduct / SortMergeJoin."""
    left = spark.range(100).select(
        F.col("id").alias("l_id"),
        (F.col("id") % 5).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        F.col("id").alias("r_id"),
        (F.col("id") % 5).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        (F.col("id") * 1.0).alias("val"),
    )
    out = asof_join(left, right, key="k", ts="ts",
                    value_cols=["val"], right_tiebreak="r_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _pd_frames():
    import pandas as pd

    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05", "2024-01-01 00:00:10",
                 "2024-01-01 00:00:20", "2024-01-01 00:00:07",
                 "2024-01-01 00:00:30", "2024-01-01 00:00:01"]
            ),
            "lv": [10, 11, 12, 20, 21, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 9],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:04", "2024-01-01 00:00:10",
                 "2024-01-01 00:00:18", "2024-01-01 00:00:09",
                 "2024-01-01 00:00:29", "2024-01-01 00:00:00"]
            ),
            "rid": [100, 101, 102, 200, 201, 900],
            "price": [1.0, 2.0, 3.0, 4.0, 5.0, 9.0],
        }
    )
    return left.sort_values("ts"), right.sort_values("ts")


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol_s", [None, 3])
def test_asof_directions_match_pandas(spark, direction, tol_s):
    """All three merge_asof directions, with and without tolerance,
    against pandas itself on data with exact-tie and no-match rows."""
    import pandas as pd

    pl, pr = _pd_frames()
    sl = spark.createDataFrame(pl)
    sr = spark.createDataFrame(pr)
    got = {
        (r.k, r.lv): r.price
        for r in asof_join(
            sl, sr, key="k", ts="ts", value_cols=["price"],
            right_tiebreak="rid", direction=direction,
            tolerance_micros=None if tol_s is None else tol_s * 1_000_000,
        ).collect()
    }
    want_df = pd.merge_asof(
        pl, pr, on="ts", by="k", direction=direction,
        tolerance=None if tol_s is None else pd.Timedelta(seconds=tol_s),
    )
    want = {
        (r.k, r.lv): (None if pd.isna(r.price) else r.price)
        for r in want_df.itertuples()
    }
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_cogroup_fallback_matches_union_window(spark, direction):
    """The cogrouped pandas merge_asof fallback and the one-shuffle
    union-window implementation must agree on every direction.
    (pandas breaks ties among equal-ts right rows by position, so the
    fixture keeps right timestamps unique per key — the tiebreak rule
    is the one place the two paths legitimately differ.)"""
    from frames_spark.operators.grouped import asof_join_cogroup

    pl, pr = _pd_frames()
    pr = pr.drop_duplicates(subset=["k", "ts"])
    sl = spark.createDataFrame(pl)
    sr = spark.createDataFrame(pr)
    a = {
        (r.k, r.lv): r.price
        for r in asof_join(
            sl, sr, key="k", ts="ts", value_cols=["price"],
            right_tiebreak="rid", direction=direction,
        ).collect()
    }
    b = {
        (r.k, r.lv): r.price
        for r in asof_join_cogroup(
            sl, sr, key="k", ts="ts", value_cols=["price"],
            direction=direction,
        ).collect()
    }
    assert a == b

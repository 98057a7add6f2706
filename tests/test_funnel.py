"""Funnel semantics: strict ordering, broken funnels, count folding."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from frames_spark.operators.funnel import funnel_counts, funnel_stages


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id: long, ts: timestamp, event_type: string",
    )


def test_strict_order_required(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),  # full
            (2, 5, "click"), (2, 6, "view"),                      # click BEFORE view
            (3, 0, "view"), (3, 0, "click"),                      # same ts: not after
            (4, 0, "purchase"),                                   # never viewed
        ],
    )
    got = {
        r.user_id: (r.step_0_ts is not None, r.step_1_ts is not None,
                    r.step_2_ts is not None)
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        1: (True, True, True),
        2: (True, False, False),   # view exists but no click after it
        3: (True, False, False),
        # user 4 absent: never reached step 0
    }


def test_first_touch_times(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 3, "view"),       # first view wins
            (1, 1, "click"), (1, 2, "click"),     # first click after t0
            (1, 4, "purchase"),
        ],
    )
    r = funnel_stages(ev, ["view", "click", "purchase"]).collect()[0]
    assert (r.step_0_ts.second, r.step_1_ts.second, r.step_2_ts.second) == (0, 1, 4)


def test_counts_monotone(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r.step: r.n_users for r in funnel_counts(
        ev, ["view", "click", "purchase"]).collect()}
    assert rows["view"] >= rows["click"] >= rows["purchase"] >= 0
    assert rows["view"] > 0


def test_single_step_funnel(spark):
    ev = _ev(spark, [(1, 0, "view"), (2, 1, "view"), (3, 0, "click")])
    rows = funnel_counts(ev, ["view"]).collect()
    assert len(rows) == 1 and rows[0].n_users == 2

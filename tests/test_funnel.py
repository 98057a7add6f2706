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


def _brute_funnel(rows, steps):
    """Reference: per user, t0 = first step0; tk = first stepk after
    t(k-1). rows: (user, second, type)."""
    out = {}
    by_user: dict[int, list] = {}
    for u, s, t in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_user.setdefault(u, []).append((s, t))
    for u, evs in by_user.items():
        times = []
        prev = None
        for step in steps:
            cand = [s for s, t in evs if t == step and (prev is None or s > prev)]
            if not cand:
                times.append(None)
                prev = -1e18  # funnel broken: later steps also None
                continue
            prev = min(cand)
            times.append(prev)
        if times[0] is not None:
            # break propagation: once a step is None all later are None
            broke = False
            for i, v in enumerate(times):
                if broke:
                    times[i] = None
                elif v is None:
                    broke = True
            out[u] = tuple(times)
    return out


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # user
            st.integers(0, 30),           # second
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_matches_reference(spark, rows):
    import datetime as dt

    data = [
        (u, dt.datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows
    ]
    ev = spark.createDataFrame(
        data, "user_id: long, ts: timestamp, event_type: string"
    )
    got = {
        r.user_id: (
            r.step_0_ts.second if r.step_0_ts else None,
            r.step_1_ts.second if r.step_1_ts else None,
            r.step_2_ts.second if r.step_2_ts else None,
        )
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    want = _brute_funnel(rows, ["view", "click", "purchase"])
    assert got == want

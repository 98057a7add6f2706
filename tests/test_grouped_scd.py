"""SCD2 collapse, per-key EWMA exactness, edit-distance-1 pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from frames_spark.dedup.editdist import deletion_variants, edit1_pairs
from frames_spark.operators.grouped import ewma_per_key
from frames_spark.operators.scd import scd2_collapse


def _d(day):
    return dt.datetime(2024, 1, day)


def test_scd2_collapses_no_change_updates(spark):
    rows = [
        (1, "A", _d(1)), (1, "A", _d(2)), (1, "B", _d(3)),
        (1, "B", _d(4)), (1, "A", _d(5)),
        (2, "X", _d(1)),
    ]
    df = spark.createDataFrame(rows, "k: long, attr: string, ts: timestamp")
    got = sorted(
        (r.k, r.attr, r.valid_from.day, r.valid_to.day if r.valid_to else None)
        for r in scd2_collapse(df, "k", "ts", ["attr"]).collect()
    )
    assert got == [
        (1, "A", 1, 3),   # A held days 1-2, superseded on day 3
        (1, "A", 5, None), # A again: a NEW version, not merged
        (1, "B", 3, 5),
        (2, "X", 1, None),
    ]


def test_scd2_null_attr_versions(spark):
    rows = [(1, None, _d(1)), (1, "A", _d(2)), (1, None, _d(3))]
    df = spark.createDataFrame(rows, "k: long, attr: string, ts: timestamp")
    out = scd2_collapse(df, "k", "ts", ["attr"]).collect()
    assert len(out) == 3  # null -> A -> null are three versions


def test_ewma_matches_manual_recursion(spark):
    rows = [(1, _d(i + 1), float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [(2, _d(1), 5.0)]
    df = spark.createDataFrame(rows, "k: long, ts: timestamp, v: double")
    got = {
        (r.k, r.ts.day): r.ewma
        for r in ewma_per_key(df, "k", "ts", "v", alpha=0.5).collect()
    }
    # manual: e0=10, e1=15, e2=22.5, e3=31.25
    assert got[(1, 1)] == 10.0
    assert got[(1, 2)] == 15.0
    assert got[(1, 3)] == 22.5
    assert got[(1, 4)] == 31.25
    assert got[(2, 1)] == 5.0


def test_ewma_independent_of_input_order(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value"
    )
    a = ewma_per_key(ev, "user_id", "ts", "value", 0.3)
    b = ewma_per_key(ev.orderBy(F.desc("value")), "user_id", "ts", "value", 0.3)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_deletion_variants(spark):
    df = spark.createDataFrame([("abc",)], "s: string")
    got = df.select(deletion_variants(F.col("s")).alias("v")).first().v
    assert set(got) == {"abc", "bc", "ac", "ab"}


def test_edit1_pairs_finds_deletions_substitutions(spark):
    words = ["spark", "sparc", "spak", "spark", "zzzz", "hello"]
    df = spark.createDataFrame([(w,) for w in words], "w: string")
    got = {tuple(r) for r in edit1_pairs(df, "w", min_len=4).collect()}
    assert ("sparc", "spark") in got      # substitution
    assert ("spak", "spark") in got       # deletion
    assert ("spak", "sparc") not in got   # distance 2
    assert all(a < b for a, b in got)


def test_holt_per_key_recurrence(spark):
    """Hand-checked Holt recurrence on a tiny series."""
    from frames_spark.operators.grouped import holt_per_key

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)], ["k", "t", "x"]
    )
    rows = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_per_key(df, "k", "t", "x", alpha=0.5, beta=0.3).collect()
    }
    assert rows[1] == (10.0, 0.0)
    l2 = 0.5 * 20.0 + 0.5 * (10.0 + 0.0)
    b2 = 0.3 * (l2 - 10.0) + 0.7 * 0.0
    assert rows[2] == (l2, b2)
    l3 = 0.5 * 30.0 + 0.5 * (l2 + b2)
    b3 = 0.3 * (l3 - l2) + 0.7 * b2
    assert rows[3] == (l3, b3)


def test_holt_rejects_bad_params(spark):
    import pytest as _pytest

    from frames_spark.operators.grouped import holt_per_key

    df = spark.createDataFrame([(1, 1, 1.0)], ["k", "t", "x"])
    with _pytest.raises(ValueError):
        holt_per_key(df, "k", "t", "x", alpha=0.0, beta=0.5)


def test_ewma_fixpoint_skip_matches_pandas_exactly(spark):
    """pandas ewm(adjust=False) SHORT-CIRCUITS when the incoming
    value equals the running average exactly (the recurrence
    (1-a)*x + a*x is NOT x in floats: 0.7*2.61 + 0.3*2.61 =
    2.6099999999999994). The r12 sf1 sweep caught the oracle
    diverging in the last ulp on users whose first two values
    collide; this pins the exact semantics — literal recurrence +
    fixpoint skip — as bit-equal to both the operator and a 200k-
    value pandas replay."""
    import numpy as np
    import pandas as pd

    # the edge itself: equal first values must stay EXACTLY equal
    df = spark.createDataFrame(
        [(1, 1, 2.61), (1, 2, 2.61), (1, 3, 3.0), (1, 4, 3.0)],
        "k long, ts long, v double",
    )
    got = {
        r.ts: r.ewma
        for r in ewma_per_key(df, "k", "ts", "v", alpha=0.3).collect()
    }
    assert got[2] == 2.61  # skip branch: NOT 2.6099999999999994
    assert got[3] == (1 - 0.3) * 2.61 + 0.3 * 3.0
    # exhaustive replay: skip + literal recurrence == pandas, bitwise
    rng = np.random.default_rng(7)
    x = np.round(rng.exponential(50, 200_000), 2)
    r = pd.Series(x).ewm(alpha=0.3, adjust=False).mean().to_numpy()
    e = np.empty_like(x)
    e[0] = x[0]
    for i in range(1, len(x)):
        e[i] = e[i - 1] if x[i] == e[i - 1] else (1 - 0.3) * e[i - 1] + 0.3 * x[i]
    assert np.array_equal(r, e)

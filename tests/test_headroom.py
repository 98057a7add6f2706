"""Integer-headroom audit for the exact-moment stats family.

The moment formulations (corr matrix, Spearman, Welch, autocorr,
anomaly z-scores) accumulate micros-quantized values in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB). r4's q_autocorr fix showed
an int64 intermediate can hide in such a pipeline and wrap silently
at a scale-factor jump. This audit amplifies the value columns by
1000x — pushing every product/sum to the magnitudes an sf1+ corpus
produces (micros ~1e14, per-row products ~1e28, n*S combinations
within a factor of ~3 of the DECIMAL(38) ceiling) — and asserts the
Spark result still matches the DuckDB oracle bit-for-bit. Any
lingering BIGINT intermediate overflows at the very first amplified
product and (ANSI mode) raises rather than matching.

Known bound, verified here to RAISE not wrap: the n*S_ij closing
combination exceeds DECIMAL(38) at roughly sf100 row counts x full
price magnitudes; ANSI mode turns that into an explicit error, never
a silent wrap.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from frames_spark.queries import ORACLES, QUERIES

AMPLIFIED = {
    "lineitem": {"l_extendedprice": 1000},
    "orders": {"o_totalprice": 1000},
    "events": {"value": 1000},
    "customer": {},
    "nation": {},
}

STATS_QUERIES = [
    "q_corr_matrix",
    "q_spearman",
    "q_welch_ttest",
    "q_autocorr",
    "q_anomaly_days",
    # third-moment family: sum x^3 at 1000x magnitudes stays within
    # DECIMAL(38) — exactly the shape r4's q_autocorr wrap hid
    "q_group_skewness",
    # r6 addition (r7 audit): Levene's zq terms are ~1e15 at 1000x
    # values, szz ~3e33 — inside DECIMAL(38); must stay bit-exact.
    # (q_jarque_bera shares kurtosis's fourth-moment ceiling: exact at
    # 30x, pinned to RAISE at 1000x below.)
    "q_levene",
]


@pytest.fixture(scope="module")
def stress_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stress_sf")
    for table, amps in AMPLIFIED.items():
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        for col, k in amps.items():
            df = df.withColumn(col, F.col(col) * k)
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{table}.parquet"))
    return str(out)


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("qname", STATS_QUERIES)
def test_stats_headroom_at_amplified_magnitudes(spark, stress_dir, qname):
    sdf = QUERIES[qname](spark, stress_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(r[c] for c in scols) for r in sdf.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )
    con = duckdb.connect()
    for t in AMPLIFIED:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{stress_dir}/{t}.parquet/*.parquet')"
        )
    res = con.sql(ORACLES[qname])
    order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    orows = sorted(
        [tuple(r[i] for i in order) for r in res.fetchall()],
        key=lambda t: tuple(str(x) for x in t),
    )
    assert sorted(res.columns) == scols
    assert len(srows) == len(orows), (len(srows), len(orows))
    for sr, orow in zip(srows, orows):
        assert all(_close(a, b) for a, b in zip(sr, orow)), (qname, sr, orow)



# Fourth-moment family: sum x^4. The sf-scale claim ("through
# sf1000") is about ROW COUNT at real magnitudes (per-row term ~1e24,
# sum < 1e38 at sf1000 rows); a 1000x VALUE amplification is a far
# harsher axis ((1e9 cents)^4 = 1e36/row) and exceeds DECIMAL(38) by
# design. Verify both halves: exact match at 30x magnitudes (already
# beyond any real price), and an explicit ANSI RAISE — never a
# silent wrap — at 1000x.
@pytest.fixture(scope="module")
def stress_dir_mid(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stress_mid")
    for table, amps in {"orders": {"o_totalprice": 30}, "customer": {}}.items():
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        for col, k in amps.items():
            df = df.withColumn(col, F.col(col) * k)
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{table}.parquet"))
    return str(out)


@pytest.mark.parametrize("qname", ["q_group_kurtosis", "q_jarque_bera"])
def test_fourth_moment_headroom_at_30x(spark, stress_dir_mid, qname):
    sdf = QUERIES[qname](spark, stress_dir_mid)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(r[c] for c in scols) for r in sdf.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{stress_dir_mid}/{t}.parquet/*.parquet')"
        )
    res = con.sql(ORACLES[qname])
    order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    orows = sorted(
        [tuple(r[i] for i in order) for r in res.fetchall()],
        key=lambda t: tuple(str(x) for x in t),
    )
    assert sorted(res.columns) == scols
    assert len(srows) == len(orows)
    for sr, orow in zip(srows, orows):
        assert all(_close(a, b) for a, b in zip(sr, orow))


def test_cramers_v_headroom_at_100x_rows(spark, sf_dir, tmp_path):
    # cramers_v is count-based (categorical cells), so its headroom
    # axis is ROW COUNT, not value magnitude: replicate orders 100x
    # (n ~1.5M at sf0.01 — per-cell chi-square terms x100) and assert
    # the integer cells pipeline still matches the oracle bit-for-bit
    out = str(tmp_path / "stress_rows")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    big = o.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(100)))).drop(
        "_r"
    )
    big.coalesce(1).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/customer.parquet")
    sdf = QUERIES["q_cramers_v"](spark, out)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(r[c] for c in scols) for r in sdf.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    res = con.sql(ORACLES["q_cramers_v"])
    order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    orows = sorted(
        [tuple(r[i] for i in order) for r in res.fetchall()],
        key=lambda t: tuple(str(x) for x in t),
    )
    assert sorted(res.columns) == scols
    assert len(srows) == len(orows)
    for sr, orow in zip(srows, orows):
        assert all(_close(a, b) for a, b in zip(sr, orow)), (sr, orow)


@pytest.mark.parametrize("qname", ["q_group_kurtosis", "q_jarque_bera"])
def test_fourth_moments_raise_not_wrap_at_1000x(spark, stress_dir, qname):
    # the documented DECIMAL(38) ceiling: ANSI mode must RAISE on the
    # sum-y^4 overflow, never return silently wrapped moments. Since
    # the r14 centered-moment rewrite the ceiling is hit by the SUM
    # aggregate over exact centered fourth powers (ARITHMETIC_OVERFLOW)
    # rather than the per-row cast (NUMERIC_VALUE_OUT_OF_RANGE) —
    # either way the failure is loud, never a wrap.
    with pytest.raises(
        Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|ARITHMETIC_OVERFLOW"
    ):
        QUERIES[qname](spark, stress_dir).collect()


def test_hll_merge_equals_full_build_and_estimates_sanely(spark, sf_dir):
    """Split-build-merge == one-shot build (mergeable cells), and the
    raw estimate lands within the textbook ~1.04/sqrt(64)=13% band
    (loose 25% assert: a broken rho computation misses by x2+)."""
    from pyspark.sql import functions as F

    from frames_spark.operators.sketches import (
        hll_cells,
        hll_estimate,
        hll_merge,
    )
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    full = {
        (r.bucket, r.max_rho) for r in hll_cells(ev, "user_id").collect()
    }
    a = hll_cells(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = hll_cells(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = {(r.bucket, r.max_rho) for r in hll_merge(a, b).collect()}
    assert merged == full
    # idempotent: merging a sketch with itself changes nothing
    again = {(r.bucket, r.max_rho) for r in hll_merge(a, a).collect()}
    assert again == {(r.bucket, r.max_rho) for r in a.collect()}
    est = hll_estimate(hll_cells(ev, "user_id")).first().est_micros / 1e6
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.25


def test_kmv_merge_estimate_and_small_exactness(spark, sf_dir):
    from pyspark.sql import functions as F

    from frames_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # split-merge == full build (mergeable bottom-k)
    full = [r.h for r in kmv_sketch(ev, "user_id").collect()]
    a = kmv_sketch(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = kmv_sketch(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = [r.h for r in kmv_merge(256, a, b).collect()]
    assert sorted(merged) == sorted(full)
    # sub-k population -> the estimate IS the exact count
    exact = ev.select("user_id").distinct().count()
    est = kmv_estimate(kmv_sketch(ev, "user_id")).first()
    if est.n_in_sketch < 256:
        assert est.est_micros == exact * 1_000_000
    else:
        assert abs(est.est_micros / 1e6 - exact) / exact < 0.2

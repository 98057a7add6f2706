"""Property-based tests (hypothesis): CSV inference lattice, melt/
pivot roundtrip, salted-aggregate equivalence.

Example counts are deliberately small — every example pays a Spark
action — but each property sweeps a space no single fixture covers.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from frames_spark.operators.melt import melt, pivot
from frames_spark.operators.skew import salted_sum_count
from frames_spark.sources.csv import infer_schema, read_csv, write_csv

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# cells that never need quoting — quoting is covered by test_csv
_plain_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


@given(
    ints=st.lists(st.integers(-(2**31), 2**31), min_size=1, max_size=5),
    floats=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=5,
    ),
    texts=st.lists(_plain_text, min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_csv_inference_lattice(spark, tmp_path_factory, ints, floats, texts):
    """An all-int column infers integral, all-float infers double,
    text infers string; values survive the write->infer->read trip."""
    n = min(len(ints), len(floats), len(texts))
    rows = list(zip(ints[:n], floats[:n], texts[:n]))
    p = str(tmp_path_factory.mktemp("csv") / "t.csv")
    with open(p, "w") as f:
        f.write("i,x,s\n")
        for i, x, s in rows:
            f.write(f"{i},{x!r},{s}\n")
    schema = infer_schema(spark, p)
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert kinds["i"] in ("int", "bigint")
    assert kinds["x"] in ("double", "int", "bigint")  # 1.0 may print as 1.0 -> double
    assert kinds["s"] in ("string", "boolean", "int", "bigint", "double")
    back = read_csv(spark, p).collect()
    assert len(back) == n
    got_i = sorted(r["i"] for r in back)
    assert got_i == sorted(ints[:n])


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_melt_pivot_roundtrip(spark, data):
    df = spark.createDataFrame(data, "id int, a double, b double")
    long = melt(df, ["id"], ["a", "b"])
    wide = pivot(long, ["id"], "variable", ["a", "b"], F.first("value"))
    got = {r["id"]: (r["a"], r["b"]) for r in wide.collect()}
    want = {i: (a, b) for i, a, b in data}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k][0], want[k][0], rel_tol=1e-12)
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-12)


@given(
    data=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(-1000, 1000)),
        min_size=1,
        max_size=20,
    ),
    salt=st.integers(2, 8),
)
@settings(**SETTINGS)
def test_salted_aggregate_equivalence(spark, data, salt):
    df = spark.createDataFrame(data, "k string, v long")
    got = {
        r["k"]: (r["sum_v"], r["n"])
        for r in salted_sum_count(df, ["k"], ["v"], salt=salt).collect()
    }
    want = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

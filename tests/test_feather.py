"""Arrow IPC source (sources/feather.py): typed distributed read of
feather shards + the bounded driver-side export roundtrip."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.feather as pf
import pytest
from pyspark.sql import functions as F

from frames_spark.sources.feather import read_feather, write_feather_shards


@pytest.fixture(scope="module")
def feather_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feather")
    t1 = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["a", "b", "c"]),
            "score": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    t2 = pa.table(
        {
            "k": pa.array([4, 5], pa.int64()),
            "name": pa.array(["d", "e"]),
            "score": pa.array([4.5, 5.5], pa.float64()),
        }
    )
    pf.write_feather(t1, str(d / "one.feather"))
    pf.write_feather(t2, str(d / "two.feather"))
    return str(d)


def test_read_feather_typed_and_complete(spark, feather_dir):
    df = read_feather(spark, feather_dir)
    assert dict(df.dtypes) == {"k": "bigint", "name": "string", "score": "double"}
    rows = {r["k"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {
        1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", 3.5),
        4: ("d", 4.5), 5: ("e", 5.5),
    }


def test_read_feather_stream_format(spark, tmp_path):
    """The streaming IPC format (no footer) is accepted per file."""
    t = pa.table({"x": pa.array([7, 8], pa.int64())})
    p = tmp_path / "s.feather"
    with pa.ipc.new_stream(str(p), t.schema) as w:
        w.write_table(t)
    df = read_feather(spark, str(tmp_path))
    assert sorted(r["x"] for r in df.collect()) == [7, 8]


def test_read_feather_empty_dir_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no files match"):
        read_feather(spark, str(tmp_path))


def test_write_feather_shards_roundtrip(spark, sf_dir, tmp_path):
    src = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )
    out = str(tmp_path / "export")
    n_shards = write_feather_shards(src, out, shard_rows=10)
    assert n_shards >= 2  # 25 nations, 10 rows/shard
    back = read_feather(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_read_feather_type_drift_raises(spark, tmp_path):
    # name-only drift checks let per-file TYPE drift through and it
    # surfaced as an opaque Arrow/pandas conversion error downstream;
    # the full (name, type) check must raise a clear error instead
    a = pa.table({"k": pa.array([1, 2], pa.int64())})
    b = pa.table({"k": pa.array(["x", "y"])})  # same name, string type
    pf.write_feather(a, str(tmp_path / "a.feather"))
    pf.write_feather(b, str(tmp_path / "b.feather"))
    with pytest.raises(Exception, match="schema drift"):
        read_feather(spark, str(tmp_path)).collect()

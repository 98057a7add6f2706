"""Versioned parquet tables (sources/versioned.py): snapshot
isolation, time travel, merge-as-new-version, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_spark.sources.versioned import (
    read_versioned,
    upsert_versioned,
    vacuum,
    versions,
    write_versioned,
)


def _rows(df):
    return {(r.k, r.v) for r in df.collect()}


def test_write_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert write_versioned(df1, t) == 1
    df2 = spark.createDataFrame([(1, "a"), (2, "b2"), (3, "c")], "k long, v string")
    assert write_versioned(df2, t) == 2
    assert _rows(read_versioned(spark, t)) == _rows(df2)
    # time travel: version 1 is immutable and still queryable
    assert _rows(read_versioned(spark, t, version=1)) == _rows(df1)
    assert versions(t) == [1, 2]


def test_upsert_creates_snapshot_and_preserves_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    write_versioned(base, t)
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    v = upsert_versioned(spark, t, updates, ["k"])
    assert v == 2
    assert _rows(read_versioned(spark, t)) == {
        (1, "a"), (2, "B"), (3, "c"), (4, "d"),
    }
    # pre-merge snapshot intact
    assert _rows(read_versioned(spark, t, version=1)) == _rows(base)


def test_reader_snapshot_unaffected_by_later_write(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(
        spark.createDataFrame([(1, "a")], "k long, v string"), t
    )
    snapshot = read_versioned(spark, t)  # resolves the pointer NOW
    write_versioned(
        spark.createDataFrame([(9, "z")], "k long, v string"), t
    )
    # the lazily-evaluated old snapshot still reads version 1's files
    assert _rows(snapshot) == {(1, "a")}
    assert _rows(read_versioned(spark, t)) == {(9, "z")}


def test_vacuum_keeps_published_and_recent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(1, 5):
        write_versioned(
            spark.createDataFrame([(i, "x")], "k long, v string"), t
        )
    removed = vacuum(t, keep_last=2)
    assert removed == [1, 2]
    assert versions(t) == [3, 4]
    assert _rows(read_versioned(spark, t)) == {(4, "x")}
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, t, version=1)


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, str(tmp_path / "missing"))


def test_uri_scheme_paths_roundtrip_via_hadoop_fs(spark, tmp_path):
    # pointer + listing I/O must go through the Hadoop FileSystem API
    # resolved from the path's own scheme (the fix for s3a://+hdfs://
    # deployments where driver-local os I/O sees an empty dir). A
    # file:// URI exercises the exact same code path locally.
    t = "file://" + str(tmp_path / "tbl")
    write_versioned(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    write_versioned(spark.createDataFrame([(2, "b")], "k long, v string"), t)
    assert versions(t) == [1, 2]
    assert _rows(read_versioned(spark, t)) == {(2, "b")}
    assert _rows(read_versioned(spark, t, version=1)) == {(1, "a")}
    for i in range(3, 6):
        write_versioned(
            spark.createDataFrame([(i, "x")], "k long, v string"), t
        )
    assert vacuum(t, keep_last=2) == [1, 2, 3]
    assert versions(t) == [4, 5]


def test_remote_scheme_without_session_raises_with_hint():
    # without a JVM, a cluster-FS path must fail loudly instead of
    # silently listing a (nonexistent) driver-local directory
    from frames_spark.sources import versioned as V

    with pytest.raises(RuntimeError, match="Hadoop FileSystem"):
        V._require_local("s3a://bucket/tbl", "versions")
    # scheme-less local paths keep the os fallback
    assert V._require_local("/tmp/x", "versions") == "/tmp/x"
    assert V._require_local("file:///tmp/x", "versions") == "/tmp/x"

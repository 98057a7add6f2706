"""sources/lakehouse.py: the gated Delta/Iceberg adapter tier.

Neither package ships in this container, so the Spark-touching round
trips run under skip-with-reason (the transformWithState pattern) and
would exercise for real on a deployment with the jars present. The
probe, the deploy-hint errors, and the SQL builders (pure functions)
are fully asserted here.
"""

from __future__ import annotations

import pytest

from frames_spark.sources import lakehouse as lh


def test_probe_is_honest(spark):
    # parquet resolves through the same registry probe; delta/iceberg
    # resolve only when their packages are deployed
    assert lh.format_available("parquet")
    for fmt in ("delta", "iceberg"):
        available = lh.format_available(fmt)
        if not available:
            with pytest.raises(RuntimeError, match="classpath"):
                lh.read_table(spark, "anything", fmt=fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="delta|iceberg"):
        lh.history(spark, "t", fmt="hudi")


def test_sql_ref_addressing():
    # Delta: paths get the delta.`path` form, identifiers pass through
    assert lh._sql_ref("/data/t", "delta") == "delta.`/data/t`"
    assert lh._sql_ref("db.tbl", "delta") == "db.tbl"
    assert lh._sql_ref("/w`eird", "delta") == "delta.`/w``eird`"
    # Iceberg: catalog identifiers only — no path addressing exists
    assert lh._sql_ref("cat.db.tbl", "iceberg") == "cat.db.tbl"
    with pytest.raises(ValueError, match="catalog identifiers"):
        lh._sql_ref("/data/t", "iceberg")


def test_merge_sql_mirrors_sink_contract():
    sql = lh._merge_upsert_sql(
        "/tbl", ["id", "day"], ["id", "day", "v"], "delta", "src"
    )
    assert sql == (
        "MERGE INTO delta.`/tbl` t USING src s "
        "ON t.`id` = s.`id` AND t.`day` = s.`day` "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError, match="at least one key"):
        lh._merge_upsert_sql("/tbl", [], ["v"], "delta", "src")
    with pytest.raises(ValueError, match="not in update columns"):
        lh._merge_upsert_sql("/tbl", ["id"], ["v"], "delta", "src")


def test_delete_sql_is_matched_delete():
    sql = lh._delete_rows_sql("cat.db.t", ["user_id"], "iceberg", "src")
    assert sql == (
        "MERGE INTO cat.db.t t USING src s "
        "ON t.`user_id` = s.`user_id` WHEN MATCHED THEN DELETE"
    )


def test_read_table_rejects_version_and_timestamp(spark):
    if not lh.delta_available():
        with pytest.raises(RuntimeError, match="classpath"):
            lh.read_table(spark, "/t", version=1, timestamp="2026-01-01")
    else:
        with pytest.raises(ValueError, match="not both"):
            lh.read_table(spark, "/t", version=1, timestamp="2026-01-01")


def test_delta_roundtrip_when_deployed(spark, tmp_path):
    """Full write -> merge -> delete -> time-travel parity with the
    plain-parquet tier — runs only on a Delta deployment."""
    if not lh.delta_available():
        pytest.skip(
            "delta-spark not on the classpath; the adapter maps "
            "versioned.py 1:1 onto Delta when deployed (see USAGE.md)"
        )
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    lh.write_table(df, path)
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    lh.merge_upsert(spark, path, upd, ["id"])
    now = {(r["id"], r["v"]) for r in lh.read_table(spark, path).collect()}
    assert now == {(1, "a"), (2, "B"), (3, "c")}
    # time travel back to the pre-merge snapshot
    v0 = {(r["id"], r["v"])
          for r in lh.read_table(spark, path, version=0).collect()}
    assert v0 == {(1, "a"), (2, "b")}
    lh.delete_rows(
        spark, path, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    left = {r["id"] for r in lh.read_table(spark, path).collect()}
    assert left == {2, 3}
    assert lh.history(spark, path).count() >= 3


def test_iceberg_roundtrip_when_deployed(spark):
    if not lh.iceberg_available():
        pytest.skip(
            "iceberg-spark-runtime not on the classpath; the adapter "
            "maps versioned.py 1:1 onto Iceberg when deployed (see "
            "USAGE.md)"
        )
    # a configured catalog is a deployment concern; smoke the probe
    assert lh.format_available("iceberg")

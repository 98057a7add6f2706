"""Synthetic event stream source: determinism + streaming agg over it."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.sources.synthetic_stream import (
    SyntheticEventsDataSource,
    synth_event,
)


def test_stream_is_deterministic_and_bounded(spark, tmp_path):
    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batch_rows", "50")
        .option("max_rows", "200")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM synth ORDER BY event_id").collect()
    assert len(rows) == 200
    # every row equals the pure generator function — replayable source
    for r in rows[:10] + rows[-5:]:
        assert tuple(r) == synth_event(r.event_id)
    # and a windowed aggregate over the synthetic events behaves
    ts = F.timestamp_micros(F.col("ts_us"))
    byuser = (
        spark.sql("SELECT * FROM synth")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert byuser.agg(F.sum("n")).first()[0] == 200
    assert ts is not None

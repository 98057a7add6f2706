"""Streaming funnel state machine == batch funnel, with state
carried across micro-batches."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

import frames_spark.streaming.events as sev
from frames_spark.operators.funnel import funnel_stages
from frames_spark.sources.tables import load_table
from frames_spark.streaming.funnel import streaming_funnel


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "fsrc"
    src.mkdir()
    # split events at the median ts into two time-ordered batches so
    # partially-converted state must survive the batch boundary
    t = pq.read_table(f"{sf_dir}/events.parquet")
    ns = t.column("ts").cast(pa.int64())
    cut = sorted(ns.to_pylist())[len(ns) // 2]
    import pyarrow.compute as pc

    early = t.filter(pc.less(pc.cast(t.column("ts"), pa.int64()), cut))
    late = t.filter(pc.greater_equal(pc.cast(t.column("ts"), pa.int64()), cut))
    pq.write_table(early, src / "events_a.parquet")
    time.sleep(1.1)  # distinct mtimes: oldest-first batch order
    pq.write_table(late, src / "events_b.parquet")

    physical = sev.probe_event_schema(spark, str(src / "events_a.parquet"))
    raw = (
        spark.readStream.schema(physical)
        .format("parquet")
        .option("pathGlobFilter", "events_*.parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    stream = sev.normalize_ts(raw, physical)
    got = {
        r.user_id: (r.step_0_us, r.step_1_us, r.step_2_us)
        for r in sev.run_to_memory(
            streaming_funnel(stream), "sfunnel", output_mode="append"
        ).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = funnel_stages(ev, ["view", "click", "purchase"]).filter(
        F.col("step_2_ts").isNotNull()
    )
    want = {
        r.user_id: (
            r.step_0_ts and int(r.step_0_ts.timestamp() * 1_000_000),
            int(r.step_1_ts.timestamp() * 1_000_000),
            int(r.step_2_ts.timestamp() * 1_000_000),
        )
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == want[u], (u, got[u], want[u])
    assert len(got) > 0

"""Structured Streaming twins of the batch event rollups."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.sources.tables import load_table
from frames_spark.streaming import events as sev


def test_windowed_rollup_matches_batch(spark, sf_dir):
    stream = sev.read_event_stream(spark, sf_dir)
    result = sev.run_to_memory(sev.windowed_rollup(stream), "win_rollup")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events")
    )
    got = {
        (r.bucket, r.event_type): r.n_events
        for r in result.select("bucket", "event_type", "n_events").collect()
    }
    want = {(r.bucket, r.event_type): r.n_events for r in batch.collect()}
    assert got == want


def test_session_rollup_event_conservation(spark, sf_dir):
    stream = sev.read_event_stream(spark, sf_dir)
    result = sev.run_to_memory(sev.session_rollup(stream), "sess_rollup")
    total = result.agg(F.sum("n_events")).first()[0]
    assert total == load_table(spark, sf_dir, "events").count()
    # session windows for one user never overlap (small result set:
    # check driver-side)
    by_user: dict[int, list[tuple]] = {}
    for r in result.collect():
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions {s1}-{e1} vs {s2}"


def test_stateful_running_user_stats(spark, sf_dir):
    """applyInPandasWithState running totals: the last emitted row per
    user must equal the batch per-user aggregate."""
    from frames_spark.streaming.stateful import running_user_stats

    stream = sev.read_event_stream(spark, sf_dir)
    result = running_user_stats(stream)
    query = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    # memory sink in update mode appends each emission; the LAST row
    # per user is the final running total
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM user_stats) WHERE rn = 1
        """
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("tv"),
        )
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch.collect()}
    assert got == want


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    """Stream-stream windowed join result == the batch range join on
    the same data (append mode, watermark-bounded state)."""
    stream = sev.read_event_stream(spark, sf_dir)
    joined = sev.stream_stream_click_purchase_join(stream)
    query = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    from frames_spark import queries as Q

    want = {
        (r.click_id, r.purchase_id)
        for r in Q.q_range_join(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_file_sink_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Parquet sink + checkpoint: a restart over the same source
    reprocesses nothing — row count stays exactly the batch count."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            sev.read_event_stream(spark, sf_dir)
            .select("event_id", "user_id", "ts", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_first = spark.read.parquet(out).count()
    run_once()  # restart from checkpoint — must be a no-op
    n_second = spark.read.parquet(out).count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n_first == n_second == n_batch


def test_stream_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    """A doubled source (every event delivered twice, in two files =
    two micro-batches) dedups back to exactly the batch row count,
    with watermark-evictable state."""
    import shutil

    src = tmp_path / "dup_events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "events_redelivered.parquet")

    physical = sev.probe_event_schema(spark, str(src / "events.parquet"))
    raw = (
        spark.readStream.schema(physical)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    stream = sev.normalize_ts(raw, physical)
    result = sev.run_to_memory(
        sev.dedup_stream(stream, ["event_id"]), "dedup_stream", output_mode="append"
    )
    n_batch = load_table(spark, sf_dir, "events").count()
    assert result.count() == n_batch
    ids = [r.event_id for r in result.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == n_batch


def test_stream_static_enrichment_join(spark, sf_dir):
    """Stream-static join: per-batch broadcast against a dim table,
    no watermark/state needed; totals match the batch join."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = sev.read_event_stream(spark, sf_dir)
    enriched = sev.enrich_with_dim(stream, dim, "user_id").groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = {
        (r.c_mktsegment, r.n)
        for r in sev.run_to_memory(enriched, "enrich").collect()
    }
    want = {
        (r.c_mktsegment, r.n)
        for r in load_table(spark, sf_dir, "events")
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch with batch-id-keyed overwrite: reprocessing a
    batch overwrites its own output instead of duplicating it — the
    exactly-once recipe for sinks without transactional support."""
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")

    def write_batch(batch_df, batch_id: int):
        # partition the sink BY BATCH ID: replays replace, never append
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        sev.read_event_stream(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_batch = load_table(spark, sf_dir, "events").count()
    written = spark.read.parquet(out)
    assert written.count() == n_batch
    # replaying batch 0 by hand is a no-op on row count (overwrite)
    b0 = written.filter(F.col("batch_id") == 0).drop("batch_id")
    write_batch(b0, 0)
    assert spark.read.parquet(out).count() == n_batch


def test_stream_stream_left_outer_matches_batch(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: unconverted clicks emit with
    null purchase columns once the watermark passes their window. A
    far-future sentinel event pushes the watermark so ALL original
    clicks resolve; the result must equal the batch left range join."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    # sentinels 10 years out, one per JOIN SIDE: the watermark is
    # tracked at each side's withWatermark node, which sits AFTER the
    # event-type filter — a sentinel of any other type would be
    # filtered out first and never advance either watermark, leaving
    # the newest unmatched clicks buffered forever. Distinct user ids
    # keep the two sentinels from matching each other.
    t = pq.read_table(f"{sf_dir}/events.parquet")
    # write the sentinel in the source's own timestamp unit/tz so the
    # stream's probed schema covers both files
    ts_type = t.column("ts").type
    per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    raw_ts = t.column("ts").cast(pa.int64()).to_pylist()
    future = max(raw_ts) + 10 * 365 * 24 * 3600 * per_s
    sentinel = pa.table(
        {
            "event_id": pa.array([-1, -2], pa.int64()),
            "ts": pa.array([future, future], pa.int64()).cast(ts_type),
            "user_id": pa.array([-999, -998], pa.int64()),
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([0.0, 0.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(sentinel, src / "events2.parquet")

    stream = sev.read_event_stream(spark, str(src), glob="events*.parquet")
    joined = sev.stream_stream_click_purchase_join(stream, how="left_outer")
    got = {
        (r.click_id, r.purchase_id)
        for r in sev.run_to_memory(joined, "loj", output_mode="append").collect()
        if r.click_id >= 0  # drop the sentinel click
    }

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (clicks["user_id"] == purchases["p_user"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (purchases["purchase_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 3600 SECONDS"))
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in clicks.join(purchases, cond, "left_outer").collect()
    }
    assert got == want
    assert any(p is None for _, p in got)  # unmatched clicks present


def test_stateful_running_user_stats_tws(spark, sf_dir):
    """transformWithState (Spark 4 API) twin of running_user_stats:
    same batch oracle, modern named-state processor."""
    import pytest as _pytest

    from frames_spark.streaming.stateful import running_user_stats_tws

    if running_user_stats_tws is None:
        _pytest.skip("transformWithState API not available")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip(
            "transformWithState's state server speaks protobuf; "
            "google.protobuf is absent in this environment"
        )
    stream = sev.read_event_stream(spark, sf_dir)
    result = running_user_stats_tws(stream)
    query = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats_tws")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM user_stats_tws) WHERE rn = 1
        """
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("tv"),
        )
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch.collect()}
    assert got == want


def test_hopping_rollup_matches_batch(spark, sf_dir):
    """Sliding-window streaming rollup == the batch hopping-window
    query (every event in 4 overlapping 1h/15min windows)."""
    stream = sev.read_event_stream(spark, sf_dir)
    result = sev.run_to_memory(
        sev.windowed_rollup(stream, window="1 hour", slide="15 minutes"),
        "hop_rollup",
    )
    got = {
        (r.bucket, r.event_type): r.n_events
        for r in result.select("bucket", "event_type", "n_events").collect()
    }
    from frames_spark import queries as Q

    want = {
        (r.w_start, r.event_type): r.n
        for r in Q.q_hopping_window(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_session_rollup_matches_q_session_window_exactly(spark, sf_dir):
    """The streaming session operator and the registered (oracle-
    gated) batch q_session_window must agree bit-for-bit: same
    half-open [start, last+gap) windows, same counts."""
    from frames_spark.queries import QUERIES

    stream = sev.read_event_stream(spark, sf_dir)
    result = sev.run_to_memory(sev.session_rollup(stream), "sess_parity")
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in result.collect()
    }
    batch = QUERIES["q_session_window"](spark, sf_dir)
    want = {}
    for r in batch.collect():
        import datetime

        s = datetime.datetime.fromtimestamp(
            r.start_us / 1e6, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        e = datetime.datetime.fromtimestamp(
            r.end_us / 1e6, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        want[(r.user_id, s, e)] = r.n_events
    assert got == want

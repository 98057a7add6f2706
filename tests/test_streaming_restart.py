"""Checkpoint-restart for stateful streams: stop mid-input, restart
from the checkpoint over NEW input, and require the final answer to
equal the batch oracle. This is the failure mode real deployments
hit first — resumed state, not replayed history, must carry users
whose activity spans the restart."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from frames_spark.sources.tables import load_table
from frames_spark.streaming import events as sev

pytestmark = pytest.mark.filterwarnings("ignore::FutureWarning")


def _us(t: dt.datetime) -> int:
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _deliver_split(ev, cutoff_us: int):
    """Events <= cutoff as phase-1, the rest as phase-2; each phase
    is written to the source dir as one file = one micro-batch, so
    per-user event-time order holds across the cut (the streaming
    funnel's documented contract)."""
    h1 = ev.filter(F.unix_micros("ts") <= cutoff_us)
    h2 = ev.filter(F.unix_micros("ts") > cutoff_us)
    return h1, h2


def _drain(
    stream_fn, spark, src: str, ckpt: str, sink: dict, mode: str = "update"
) -> None:
    physical = sev.probe_event_schema(spark, src)
    raw = spark.readStream.schema(physical).format("parquet").load(src)
    result = stream_fn(sev.normalize_ts(raw, physical))

    def absorb(batch_df, batch_id: int) -> None:
        for r in batch_df.collect():
            sink[r[0]] = tuple(r)[1:]

    q = (
        result.writeStream.outputMode(mode)
        .foreachBatch(absorb)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_running_user_stats_survives_restart(spark, tmp_path, sf_dir):
    from frames_spark.streaming.stateful import running_user_stats

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.expr("percentile(unix_micros(ts), 0.5)").cast("long")
    ).collect()[0][0]
    h1, h2 = _deliver_split(ev, cutoff)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_stats")
    phase1: dict = {}
    phase2: dict = {}

    h1.coalesce(1).write.mode("append").parquet(src)
    _drain(running_user_stats, spark, src, ckpt, phase1)
    h2.coalesce(1).write.mode("append").parquet(src)
    _drain(running_user_stats, spark, src, ckpt, phase2)

    # restart must resume, not replay: phase 2 emits only users the
    # second half touched, with totals CONTINUING from restored state
    spanning = [
        u for u in phase2 if u in phase1 and phase2[u][0] > phase1[u][0]
    ]
    assert spanning, "no user spans the restart — split is degenerate"

    final = dict(phase1)
    final.update(phase2)
    got = {u: (n, round(tv, 6)) for u, (n, tv, _ts) in final.items()}
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("tv"),
        )
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch.collect()}
    assert got == want


def test_streaming_funnel_survives_restart(spark, tmp_path, sf_dir):
    from frames_spark.operators import funnel as funnel_ops
    from frames_spark.streaming.funnel import streaming_funnel

    ev = load_table(spark, sf_dir, "events")
    batch = funnel_ops.funnel_stages(ev, ["view", "click", "purchase"]).filter(
        F.col("step_2_ts").isNotNull()
    )
    want = {
        r.user_id: (_us(r.step_0_ts), _us(r.step_1_ts), _us(r.step_2_ts))
        for r in batch.collect()
    }
    assert want, "no completed funnels in the data"
    # Cut just BEFORE the median completer's purchase: that user's
    # view/click land in phase 1 and their completing purchase in
    # phase 2, so at least one funnel is GUARANTEED to span the
    # restart — the state-restoration proof cannot be vacuous.
    median_t2 = sorted(t2 for (_t0, _t1, t2) in want.values())[len(want) // 2]
    cutoff = median_t2 - 1

    h1, h2 = _deliver_split(ev, cutoff)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_funnel")
    phase1: dict = {}
    phase2: dict = {}

    h1.coalesce(1).write.mode("append").parquet(src)
    _drain(streaming_funnel, spark, src, ckpt, phase1, mode="append")
    h2.coalesce(1).write.mode("append").parquet(src)
    _drain(streaming_funnel, spark, src, ckpt, phase2, mode="append")

    # completions are emit-once: no user may complete in both phases
    assert not set(phase1) & set(phase2)
    assert phase1 and phase2, "both phases must complete someone"
    # the state-restoration proof: someone started before the cut
    # and completed after the restart
    assert any(t0 <= cutoff for (t0, _t1, _t2) in phase2.values()), (
        "no funnel spans the restart"
    )

    final = dict(phase1)
    final.update(phase2)
    assert final == want


def test_first_seen_days_matches_batch_across_cut(spark, tmp_path, sf_dir):
    """first_seen_days over a two-batch event-time cut must reproduce
    the batch new-vs-returning split exactly: users whose activity
    spans the cut are 'returning' in phase 2 only because phase-1
    state remembers them."""
    from frames_spark.queries import QUERIES
    from frames_spark.streaming.stateful import first_seen_days

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) // 2
    h1, h2 = _deliver_split(ev, cut)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows: dict = {}

    def absorb(batch_df, batch_id: int) -> None:
        for r in batch_df.collect():
            rows[(r["user_id"], r["day"])] = r["is_new"]

    for phase in (h1, h2):
        phase.coalesce(1).write.mode("append").parquet(src)
        physical = sev.probe_event_schema(spark, src)
        raw = spark.readStream.schema(physical).format("parquet").load(src)
        q = (
            first_seen_days(sev.normalize_ts(raw, physical))
            .writeStream.outputMode("update")
            .foreachBatch(absorb)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # exactly one emission per (user, day)
    batch = QUERIES["q_new_vs_returning"](spark, sf_dir).collect()
    got_new = {}
    got_ret = {}
    for (u, day), is_new in rows.items():
        if is_new:
            got_new[day] = got_new.get(day, 0) + 1
        else:
            got_ret[day] = got_ret.get(day, 0) + 1
    assert {
        r["day"]: r["new_users"] for r in batch if r["new_users"]
    } == got_new
    assert {
        r["day"]: r["returning_users"] for r in batch if r["returning_users"]
    } == got_ret

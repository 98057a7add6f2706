"""Incremental rollup merge algebra + clustered-write data skipping."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from frames_spark.sources.sink import (
    append_rollup_increment,
    read_rollup,
    write_clustered,
)
from frames_spark.sources.tables import load_table


def test_rollup_increments_merge_to_direct_agg(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")
    # two ingest batches, split arbitrarily (odd/even event ids) —
    # partials must merge to the same totals as one direct aggregate
    append_rollup_increment(
        ev.filter(F.col("event_id") % 2 == 0), path, ["event_type"], "value"
    )
    append_rollup_increment(
        ev.filter(F.col("event_id") % 2 == 1), path, ["event_type"], "value"
    )
    got = {
        (r.w_start, r.event_type): (r.total, r.n)
        for r in read_rollup(spark, path, ["event_type"]).collect()
    }
    want = {
        (r.w_start, r.event_type): (r.total, r.n)
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "total", "n")
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6  # float sum assoc only

    # incremental property: each batch appends at most one partial
    # row per (window, key) — O(distinct keys), not O(events)
    n_partials = spark.read.parquet(path).count()
    assert n_partials <= 2 * len(want)


def _files_containing(path: str, col: str, value) -> int:
    """Files whose [min, max] span admits `value` (must-read files)."""
    import glob
    n = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            cols = {
                md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
            }
            st = cols[col].statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None and lo <= value <= hi:
            n += 1
    return n


def test_clustered_write_tightens_file_ranges(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    probe = o.select("o_custkey").first().o_custkey
    shuffled = str(tmp_path / "shuffled")
    clustered = str(tmp_path / "clustered")
    # baseline: hash-repartitioned layout — every file spans the key range
    o.repartition(8).write.parquet(shuffled)
    write_clustered(o, clustered, ["o_custkey", "o_orderkey"], n_files=8)

    assert spark.read.parquet(clustered).count() == o.count()
    base = _files_containing(shuffled, "o_custkey", probe)
    clus = _files_containing(clustered, "o_custkey", probe)
    assert base == 8          # unclustered: no file can be skipped
    assert clus < base        # clustered: most files prune on min/max


def test_compact_small_files(spark, sf_dir, tmp_path):
    from frames_spark.sources.sink import compact

    ev = load_table(spark, sf_dir, "events")
    fragmented = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(fragmented)  # 64 tiny files
    import glob
    assert len(glob.glob(f"{fragmented}/*.parquet")) == 64
    out = str(tmp_path / "compacted")
    n = compact(spark, fragmented, out, target_file_mb=128)
    written = glob.glob(f"{out}/*.parquet")
    assert len(written) == n == 1  # tiny table -> one file
    assert spark.read.parquet(out).count() == ev.count()


def test_merge_upsert(spark, sf_dir, tmp_path):
    from frames_spark.sources.sink import merge_upsert

    target = str(tmp_path / "dim")
    c = load_table(spark, sf_dir, "customer")
    c.write.parquet(target)
    n0 = c.count()
    updates = spark.createDataFrame(
        [(1, "UPDATED", 0, 0.0, "SEG"), (10**9, "NEW", 0, 1.0, "SEG")],
        schema=c.schema,
    )
    merge_upsert(spark, target, updates, keys=["c_custkey"])
    after = spark.read.parquet(target)
    assert after.count() == n0 + 1                     # 1 update + 1 insert
    rows = {r.c_custkey: r.c_name for r in after.filter(
        F.col("c_custkey").isin(1, 10**9)).collect()}
    assert rows == {1: "UPDATED", 10**9: "NEW"}
    # untouched rows survive byte-identical
    assert after.filter(F.col("c_custkey") == 2).count() == 1


def test_footer_stats_metadata_only(spark, sf_dir):
    from frames_spark.sources.sink import footer_stats

    path = f"{sf_dir}/orders.parquet"
    stats = footer_stats(spark, path, ["o_totalprice", "o_orderkey"])
    o = spark.read.parquet(path)
    row = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice"),
        F.min("o_orderkey"), F.max("o_orderkey"), F.count(F.lit(1)),
    ).first()
    assert stats["o_totalprice"] == {"min": row[0], "max": row[1], "count": row[4]}
    assert stats["o_orderkey"] == {"min": row[2], "max": row[3], "count": row[4]}
    # the plan really pushed the aggregate into the scan
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        plan = (
            spark.read.parquet(path)
            .agg(F.min("o_orderkey"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedAggregation: [MIN(o_orderkey)]" in plan
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.unset("spark.sql.sources.useV1SourceList")


def test_delete_rows(spark, sf_dir, tmp_path):
    """Right-to-erasure propagation: every row for the deleted keys is
    gone, every other row byte-identical, and the swap leaves exactly
    one table directory."""
    import os

    from frames_spark.sources.sink import delete_rows

    target = str(tmp_path / "events_tbl")
    load_table(spark, sf_dir, "events").write.parquet(target)
    doomed = spark.createDataFrame([(3,), (7,), (11,)], "user_id long")

    before = spark.read.parquet(target)
    expect_gone = before.filter(F.col("user_id").isin(3, 7, 11)).count()
    expect_keep = before.count() - expect_gone
    assert expect_gone > 0

    n_deleted = delete_rows(spark, target, doomed, keys=["user_id"])
    assert n_deleted == expect_gone
    after = spark.read.parquet(target)
    assert after.count() == expect_keep
    assert after.filter(F.col("user_id").isin(3, 7, 11)).count() == 0
    assert not [d for d in os.listdir(tmp_path) if "retired" in d]


def test_histogram_parts_streaming_quantiles(spark, sf_dir, tmp_path):
    """Histogram parts appended batch-by-batch answer the same
    quantiles as a direct pass over all the data — the mergeability
    contract under incremental ingest, including a range-restricted
    read that only touches a subset of parts."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from frames_spark.sources.sink import (
        append_histogram_increment,
        read_quantiles,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    path = str(tmp_path / "hist_parts")
    # two ingest batches (a batch boundary inside a day is fine —
    # partial bins merge by summation)
    append_histogram_increment(ev.filter(F.col("ts") <= mid), path, "value")
    append_histogram_increment(ev.filter(F.col("ts") > mid), path, "value")

    got = {
        r["p"]: r
        for r in read_quantiles(
            spark, path, [0.5, 0.9], bin_width_micros=100_000_000
        ).collect()
    }
    vals = [
        r[0]
        for r in duckdb.sql(
            f"SELECT value FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchall()
    ]
    vals.sort()
    n = len(vals)
    for p in (0.5, 0.9):
        exact = vals[math.ceil(p * n) - 1]
        est = got[p]["est_lo_micros"]
        assert est <= exact * 1e6 < est + 100_000_000
        assert got[p]["n"] == n

    # range-restricted read: only parts in [lo, mid-day) are merged
    import datetime as dt

    day0 = dt.datetime(lo.year, lo.month, lo.day)
    cut = day0 + dt.timedelta(days=7)
    small = read_quantiles(
        spark, path, [0.5], lo=day0, hi=cut
    ).collect()[0]
    n_small = ev.filter(
        (F.date_trunc("day", "ts") >= F.lit(day0))
        & (F.date_trunc("day", "ts") < F.lit(cut))
    ).count()
    assert small["n"] == n_small < n


def test_histogram_parts_streaming_exactly_once(spark, sf_dir, tmp_path):
    """True streaming ingest: readStream -> foreachBatch appending
    batch-id-partitioned parts. Replaying a batch (the restart
    failure mode) must REPLACE its parts, not double-count — the
    merged quantile row is identical before and after the replay."""
    from pyspark.sql import functions as F

    from frames_spark.sources.sink import (
        append_histogram_increment,
        read_quantiles,
    )
    from frames_spark.streaming import events as sev

    src = f"{sf_dir}"
    parts = str(tmp_path / "parts")
    ckpt = str(tmp_path / "ckpt")
    physical = sev.probe_event_schema(spark, f"{src}/events.parquet")
    raw = (
        spark.readStream.schema(physical)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(src)
    )
    stream = sev.normalize_ts(raw, physical)
    seen = {}

    def write_batch(batch_df, batch_id: int):
        seen[batch_id] = batch_df.count()
        append_histogram_increment(
            batch_df, parts, "value", batch_id=batch_id
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen

    before = sorted(
        tuple(r) for r in read_quantiles(spark, parts, [0.5, 0.9]).collect()
    )
    # replay the first batch verbatim (simulates restart after a
    # sink write that wasn't acknowledged)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    replay_id = min(seen)
    append_histogram_increment(ev, parts, "value", batch_id=replay_id)
    # (replaying with the FULL data is the worst case: it replaces the
    # old batch's parts wholesale rather than appending to them)
    after_replace = sorted(
        tuple(r) for r in read_quantiles(spark, parts, [0.5, 0.9]).collect()
    )
    # n must equal full-table count, not count + replay
    n_total = ev.count()
    extra = sum(c for b, c in seen.items() if b != replay_id)
    assert all(r[1] == n_total + extra for r in after_replace)
    if len(seen) == 1:
        assert after_replace == before


def test_histogram_sink_negative_values_floor_binned(spark, tmp_path):
    """Integer DIV truncates toward zero, which used to collapse all
    of (-width, width) into one double-width bin and turn the
    bin-lower-bound quantile estimate into an UPPER bound for
    negative values. Floor binning keeps est_lo <= exact < est_lo +
    width for every sign."""
    import math

    from pyspark.sql import functions as F

    from frames_spark.sources.sink import (
        append_histogram_increment,
        read_quantiles,
    )

    vals = [v / 10.0 for v in range(-500, 500)]  # -50.0 .. 49.9
    ev = spark.createDataFrame(
        [("2024-01-01 00:00:00", v) for v in vals], "ts string, value double"
    ).select(F.col("ts").cast("timestamp"), "value")
    path = str(tmp_path / "neg_hist")
    width = 10_000_000  # 10-unit-micros bins spanning negatives
    append_histogram_increment(ev, path, "value", bin_width_micros=width)
    got = {
        r["p"]: r["est_lo_micros"]
        for r in read_quantiles(
            spark, path, [0.1, 0.5, 0.9], bin_width_micros=width
        ).collect()
    }
    svals = sorted(vals)
    n = len(svals)
    for p in (0.1, 0.5, 0.9):
        exact = svals[math.ceil(p * n) - 1] * 1e6
        assert got[p] <= exact < got[p] + width, (p, got[p], exact)

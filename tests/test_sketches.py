"""HLL sketch parts: accuracy, mergeability, and parquet round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators.sketches import merge_sketches, sketch_parts
from frames_spark.sources.tables import load_table


def _daily_parts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return ev, sketch_parts(ev, ["day"], "user_id")


def test_merged_estimate_within_bounds(spark, sf_dir):
    ev, parts = _daily_parts(spark, sf_dir)
    est = merge_sketches(parts).collect()[0].n_distinct_est
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05  # lgk=12 ~ 1.6% rse


def test_merge_equals_direct_sketch(spark, sf_dir):
    """Union of daily sketches == one sketch over everything — the
    mergeability contract that makes stored parts trustworthy."""
    ev, parts = _daily_parts(spark, sf_dir)
    merged = merge_sketches(parts).collect()[0].n_distinct_est
    direct = (
        ev.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))).alias("e"))
        .collect()[0].e
    )
    assert merged == direct


def test_parts_roundtrip_parquet(spark, sf_dir, tmp_path):
    """Sketches survive storage: write the parts table, read it back,
    merge — same estimate. This is the incremental-rollup read path."""
    _, parts = _daily_parts(spark, sf_dir)
    p = str(tmp_path / "sketch_parts")
    parts.write.parquet(p)
    reloaded = spark.read.parquet(p)
    a = merge_sketches(parts).collect()[0].n_distinct_est
    b = merge_sketches(reloaded).collect()[0].n_distinct_est
    assert a == b
    # and a coarser regroup (weekly) still answers from stored parts
    weekly = merge_sketches(
        reloaded.withColumn("week", F.date_trunc("week", F.col("day"))),
        ["week"],
    )
    assert weekly.count() >= 1


def test_sketch_wau_close_to_exact(spark, sf_dir):
    """The sketch WAU path stays within HLL error of the exact
    pairs-x-7 computation for every window."""
    from frames_spark import queries as Q

    exact = {r.day: r.wau for r in Q.q_active_users(spark, sf_dir).collect()}
    est = {
        r.day: r.wau_est_micros / 1e6
        for r in Q.q_active_users_sketch(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for day, wau in exact.items():
        # p=12 linear counting: a single register collision at tiny n
        # (sf0.001 windows hold ~15 users) is ~1 absolute — bound by
        # max(2 absolute, 5% relative) like the overlap test.
        assert abs(est[day] - wau) <= max(2, 0.05 * wau), (day, est[day], wau)


def test_sketch_overlap_within_tolerance(spark, sf_dir):
    """Inclusion-exclusion over HLL unions lands within a few percent
    of the exact week1 ∩ week4 user overlap (differences of estimates
    compound error — tolerance is looser than single-sketch bounds)."""
    import pyspark.sql.functions as F

    from frames_spark.queries import QUERIES
    from frames_spark.sources.tables import load_table

    r = QUERIES["q_sketch_overlap"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    w0 = ev.agg(F.min(wk)).collect()[0][0]
    users = (
        ev.select(
            "user_id", F.datediff(wk, F.lit(w0)).alias("d")
        )
        .filter(F.col("d").isin(0, 21))
        .distinct()
    )
    a = {r2["user_id"] for r2 in users.filter(F.col("d") == 0).collect()}
    b = {r2["user_id"] for r2 in users.filter(F.col("d") == 21).collect()}
    exact = len(a & b)
    assert abs(r["overlap_est_micros"] / 1e6 - exact) <= max(3, 0.1 * exact)
    assert abs(r["n_week1_micros"] / 1e6 - len(a)) <= max(2, 0.05 * len(a))


def test_count_min_overestimates_never_under(spark, sf_dir):
    from frames_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )
    from frames_spark.functions.text import tokens
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100).cache()
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("t")).filter(
        F.col("t") != ""
    )
    truth = {r.t: r.n for r in tok.groupBy("t").count().withColumnRenamed("count", "n").collect()}
    sketch = count_min_build(tok, "t", depth=4, width=256)
    est = {
        r.key: r.est
        for r in count_min_estimate(
            sketch, tok.select(F.col("t")).distinct(), "t", depth=4, width=256
        ).collect()
    }
    assert set(est) == set(truth)
    # one-sided guarantee: never underestimates
    assert all(est[t] >= n for t, n in truth.items())
    # and the total cell mass per row equals the stream length
    n_stream = sum(truth.values())
    per_row = {
        r.row: r.s
        for r in sketch.groupBy("row").agg(F.sum("c").alias("s")).collect()
    }
    assert per_row == {j: n_stream for j in range(4)}


def test_count_min_merge_equals_whole(spark, sf_dir):
    from frames_spark.operators.sketches import (
        count_min_build,
        count_min_merge,
    )
    from frames_spark.functions.text import tokens
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60).cache()
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    a = tok.filter(F.col("doc_id") % 2 == 0)
    b = tok.filter(F.col("doc_id") % 2 == 1)
    merged = {
        (r.row, r.col): r.c
        for r in count_min_merge(
            count_min_build(a, "t"), count_min_build(b, "t")
        ).collect()
    }
    whole = {
        (r.row, r.col): r.c for r in count_min_build(tok, "t").collect()
    }
    assert merged == whole


def test_cms_stream_increments_match_batch(spark, sf_dir, tmp_path):
    """foreachBatch CMS increments (with a replayed epoch) merge to
    exactly the one-shot batch sketch — the mergeable-sketch contract
    the HLL rollup rows follow, now value-checkable because CMS cells
    are engine-portable integers."""
    from frames_spark.operators.sketches import (
        append_cms_increment,
        count_min_build,
        read_cms,
    )
    from frames_spark.functions.text import tokens
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60).cache()
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    store = str(tmp_path / "cms_store")
    a = tok.filter(F.col("doc_id") % 2 == 0)
    b = tok.filter(F.col("doc_id") % 2 == 1)
    append_cms_increment(a, store, "t", batch_id=0)
    append_cms_increment(b, store, "t", batch_id=1)
    append_cms_increment(b, store, "t", batch_id=1)  # replay: replaces
    merged = {
        (r.row, r.col): r.c for r in read_cms(spark, store).collect()
    }
    whole = {(r.row, r.col): r.c for r in count_min_build(tok, "t").collect()}
    assert merged == whole


def test_bloom_probe_duplicate_keys_no_false_negative(spark):
    # r7 advice: a probe key appearing d times exploded to d*k rows and
    # nset==k returned a false NEGATIVE. Bloom filters must never
    # false-negative — duplicated probe keys must report exactly like
    # their distinct form.
    from frames_spark.operators.sketches import bloom_bits, bloom_probe

    members = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bits = bloom_bits(members, "k")
    dup_probes = spark.createDataFrame(
        [(i,) for i in range(40, 60) for _ in range(3)], "k long"
    )
    got = {
        r.key: r.maybe_present
        for r in bloom_probe(dup_probes, bits, "k").collect()
    }
    # one row per DISTINCT key
    assert len(got) == 20
    # every true member reports present regardless of duplication
    for i in range(40, 50):
        assert got[i] is True, i


def test_ams_f2_merge_and_accuracy(spark, sf_dir):
    # AMS signs are linear: the merged sketch of two disjoint halves
    # must equal the whole-stream sketch EXACTLY, and the estimate
    # must land within the theoretical ballpark of the exact F2.
    from frames_spark.operators.sketches import (
        ams_estimate,
        ams_merge,
        ams_sketch,
    )
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    whole = {(r.r, r.s) for r in ams_sketch(ev, "user_id").collect()}
    a = ams_sketch(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = ams_sketch(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = {(r.r, r.s) for r in ams_merge(a, b).collect()}
    assert merged == whole
    est = ams_estimate(ams_sketch(ev, "user_id")).collect()[0]
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
        .collect()[0]["f2"]
    )
    assert est.n_replicates == 16
    # 16 replicates: std err ~ sqrt(2/16) ~ 35%; allow 3 sigma
    assert abs(est.f2_est - exact) / exact < 1.05


def test_ams_stream_increments_match_batch(spark, sf_dir, tmp_path):
    # foreachBatch epochs with a replay: the stored sketch must equal
    # the one-shot batch sketch exactly (dynamic overwrite makes the
    # replayed epoch replace itself, not double-count)
    from frames_spark.operators.sketches import (
        ams_sketch,
        append_ams_increment,
        read_ams,
    )
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(400).localCheckpoint()
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    store = str(tmp_path / "ams_store")
    append_ams_increment(a, store, "user_id", batch_id=0)
    append_ams_increment(b, store, "user_id", batch_id=1)
    append_ams_increment(b, store, "user_id", batch_id=1)  # replay: replaces
    got = {(r.r, r.s) for r in read_ams(spark, store).collect()}
    want = {(r.r, r.s) for r in ams_sketch(ev, "user_id").collect()}
    assert got == want


def test_grouped_hll_cells_merge_to_global(spark, sf_dir):
    # the rollup identity: merging per-group register relations must
    # equal the one-shot global sketch exactly (max is associative)
    from frames_spark.operators.sketches import (
        hll_cells,
        hll_cells_by,
        hll_merge,
    )
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    per = hll_cells_by(ev, ["event_type"], "user_id")
    merged = {
        (r.bucket, r.max_rho)
        for r in hll_merge(per.select("bucket", "max_rho")).collect()
    }
    whole = {(r.bucket, r.max_rho) for r in hll_cells(ev, "user_id").collect()}
    assert merged == whole


def test_sketch_overlap_empty_week_parity(spark, tmp_path):
    # r10 advice #4: if week index 0 or 3 has no events, the Spark
    # side's inner crossJoin yields 0 rows — the oracle's old scalar
    # subqueries yielded 1 row with NULLs. Both sides must now emit
    # 0 rows on a corpus whose events all land in week 0.
    import duckdb

    from frames_spark.queries import ORACLES, QUERIES

    ev = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 5} 12:00:00", i % 7) for i in range(20)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    d = str(tmp_path / "oneweek")
    ev.coalesce(1).write.parquet(f"{d}/events.parquet")
    assert QUERIES["q_sketch_overlap"](spark, d).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    assert len(con.execute(ORACLES["q_sketch_overlap"]).fetchall()) == 0

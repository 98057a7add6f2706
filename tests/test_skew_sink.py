"""Skew-salted operators (operators/skew.py) and sinks
(sources/sink.py): results must equal the unsalted/unbucketed
equivalents, and the plans must show the promised shape
(two-stage aggregate; zero-exchange bucketed join; partition
pruning on partitioned parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_spark.operators.skew import salted_join, salted_sum_count
from frames_spark.sources.sink import read_table, write_bucketed, write_partitioned


@pytest.fixture
def skewed(spark):
    # 10k rows, 90% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise((F.floor(F.col("id") / 10) % 5).cast("string"))
        .alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.col("id").alias("rid"),
    )


def test_salted_sum_count_matches_plain(spark, skewed):
    got = {
        r["k"]: (r["sum_v"], r["n"])
        for r in salted_sum_count(skewed, ["k"], ["v"], salt=8).collect()
    }
    want = {
        r["k"]: (r["sum_v"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6 * max(1.0, abs(want[k][0]))


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("0", "a"), ("1", "b"), ("2", "c")], "k string, label string"
    )
    got = sorted(
        (r["rid"], r["label"])
        for r in salted_join(skewed, dim, "k", salt=8).collect()
    )
    want = sorted(
        (r["rid"], r["label"]) for r in skewed.join(dim, "k", "inner").collect()
    )
    assert got == want

    # left join keeps unmatched large rows exactly once
    dim2 = dim.filter(F.col("k") != "hot")
    left = salted_join(skewed, dim2, "k", salt=8, how="left")
    assert left.count() == skewed.count()
    assert left.filter(F.col("label").isNull()).count() == skewed.filter(
        ~F.col("k").isin("0", "1", "2")
    ).count()


def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a_val")
        )
        b = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b_val")
        )
        write_bucketed(a, "t_bkt_a", "k", 4, sort_col="k", path=str(tmp_path / "a"))
        write_bucketed(b, "t_bkt_b", "k", 4, sort_col="k", path=str(tmp_path / "b"))
        joined = read_table(spark, "t_bkt_a").join(
            read_table(spark, "t_bkt_b"), "k", "inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("part"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "pp")
    write_partitioned(df, path, ["part"])
    back = spark.read.parquet(path)
    one = back.filter(F.col("part") == "2")
    assert one.count() == 25
    # partition filter must reach the scan as a PartitionFilter
    # (directory skip), not a post-scan data filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "= 2" in pf, plan


def test_training_shards_deterministic_and_ordered(spark, sf_dir, tmp_path):
    from frames_spark.functions.hashing import hash60
    from frames_spark.sources.sink import write_training_shards
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 8
    # assignment is the content hash, not layout
    expect = docs.select(
        "doc_id",
        F.pmod(hash60(F.col("doc_id").cast("string"), seed="shard"), F.lit(8)).alias("s"),
    )
    j = back.select("doc_id", "shard").join(expect, "doc_id")
    assert j.filter(F.col("shard") != F.col("s")).count() == 0
    # in-file order is the hash order (read one shard's file directly)
    import glob

    f = sorted(glob.glob(f"{out}/shard=3/*.parquet"))[0]
    rows = [r.doc_id for r in spark.read.parquet(f).collect()]
    hs = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", hash60(F.col("doc_id").cast("string"), seed="shard").alias("h")
        ).collect()
    }
    assert rows == sorted(rows, key=lambda d: (hs[d], d))
    # re-running over a recompacted (shuffled-layout) copy is identical
    re_src = docs.repartition(13)
    out2 = str(tmp_path / "shards2")
    write_training_shards(re_src, out2, n_shards=8)
    a = {(r.doc_id, r.shard) for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b


def test_training_shards_multifile_concatenates_to_single_file_order(
    spark, sf_dir, tmp_path
):
    # files_per_shard=k removes the n_shards write-parallelism bound;
    # the guarantee is that concatenating a shard's file_id dirs in
    # lexicographic order reproduces the single-file hash order
    import glob

    from frames_spark.sources.sink import write_training_shards
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    single = str(tmp_path / "single")
    multi = str(tmp_path / "multi")
    write_training_shards(docs, single, n_shards=4)
    write_training_shards(docs, multi, n_shards=4, files_per_shard=4)
    for shard in range(4):
        (sf,) = sorted(glob.glob(f"{single}/shard={shard}/*.parquet"))
        want = [r.doc_id for r in spark.read.parquet(sf).collect()]
        got = []
        for fdir in sorted(glob.glob(f"{multi}/shard={shard}/file_id=*")):
            for part in sorted(glob.glob(f"{fdir}/*.parquet")):
                got.extend(r.doc_id for r in spark.read.parquet(part).collect())
        assert got == want, f"shard {shard} concatenation diverged"
    # sub-file assignment is content-determined: a recompacted copy
    # produces the identical (doc_id, shard, file_id) mapping
    multi2 = str(tmp_path / "multi2")
    write_training_shards(
        docs.repartition(13), multi2, n_shards=4, files_per_shard=4
    )
    key = lambda p: {  # noqa: E731
        (r.doc_id, r.shard, r.file_id)
        for r in spark.read.parquet(p).select("doc_id", "shard", "file_id").collect()
    }
    assert key(multi) == key(multi2)

"""Plan-shape assertions — the 100 TB posture is tested, not assumed
(SURVEY.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark import queries as Q
from frames_spark.operators import joins
from frames_spark.plans import explain
from frames_spark.sources.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = Q.q_filter_project(spark, sf_dir)
    assert explain.has_pushed_filters(df)


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = Q.q_filter_project(spark, sf_dir)
    for schema in explain.scan_read_schema(df):
        assert "l_comment" not in schema
        assert "l_partkey" not in schema  # unused column pruned


def test_dim_join_broadcasts(spark, sf_dir):
    df = Q.q_join_inner(spark, sf_dir)
    assert explain.uses_broadcast_join(df)
    assert not explain.has_cartesian(df)


def test_flagship_no_cartesian_and_codegen(spark, sf_dir):
    df = Q.q_group_fold(spark, sf_dir)
    assert not explain.has_cartesian(df)
    # the oracle variant's decimal sums opt out of codegen (expected);
    # the production double-typed variant must stay codegen'd. AQE
    # hides codegen subtrees pre-execution, so build with it off.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bench = Q.q1_bench(spark, sf_dir)
        assert explain.whole_stage_codegen_spans(bench) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_semi_join_prunes_payload(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = joins.semi_join(
        c, o.select("o_custkey", "o_totalprice"), [("c_custkey", "o_custkey")]
    )
    # right-side scan should read only the join key
    schemas = explain.scan_read_schema(semi)
    assert any("o_custkey" in s and "o_totalprice" not in s for s in schemas)


def test_dedup_candidates_no_cartesian(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    from frames_spark.dedup import minhash

    sigs = minhash.minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    cands = minhash.lsh_candidate_pairs(sigs, 4, 2)
    assert not explain.has_cartesian(cands)


def test_events_window_partial_agg(spark, sf_dir):
    df = Q.q_events_window(spark, sf_dir)
    plan = explain.formatted_plan(df)
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_ann_bruteforce_broadcasts_queries(spark, sf_dir):
    df = Q.q_ann_bruteforce(spark, sf_dir)
    assert explain.uses_broadcast_join(df)


def test_bloom_filtered_write(spark, tmp_path):
    """write_bloom_filtered embeds a bloom bitset per row group
    (witnessed by the deterministic size delta — pyarrow's metadata
    API doesn't surface bloom offsets) and point lookups read back
    correctly through it."""
    import glob
    import os

    from frames_spark.sources.sink import write_bloom_filtered

    df = spark.range(50_000).selectExpr(
        "md5(cast(id as string)) AS k", "id AS v"
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.mode("overwrite").parquet(plain)
    write_bloom_filtered(df, bloomed, ["k"], expected_ndv=50_000)

    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    delta = size(bloomed) - size(plain)
    # split-block bloom for 50k NDV ~ 64KB; anything comfortably
    # above a few KB proves the bitset landed
    assert delta > 16_384, delta

    # point lookup through the bloomed file returns the right row
    import pyspark.sql.functions as F

    probe = (
        spark.read.parquet(bloomed)
        .filter(F.col("k") == F.md5(F.lit("123")))
        .collect()
    )
    assert len(probe) == 1 and probe[0]["v"] == 123

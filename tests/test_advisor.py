"""Plan advisor: each anti-pattern fires on a deliberately bad plan
and stays silent on the engine's good plans."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from frames_spark.plans.advisor import advise, assert_clean


def _codes(df):
    return {f.code for f in advise(df)}


def test_cartesian_flagged(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/region.parquet")
    b = spark.read.parquet(f"{sf_dir}/nation.parquet")
    bad = a.crossJoin(b.hint("shuffle_replicate_nl"))
    assert "CARTESIAN" in _codes(bad)


def test_global_window_flagged_on_fact_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    assert "GLOBAL_WINDOW" in _codes(bad)


def test_global_window_ok_over_aggregate(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    fine = daily.withColumn(
        "cum", F.sum("rev").over(Window.orderBy("d"))
    )
    assert "GLOBAL_WINDOW" not in _codes(fine)


def test_pushdown_miss_flagged(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # a predicate parquet cannot push (expression over two columns)
    bad = li.filter(
        F.col("l_extendedprice") * F.col("l_discount") > 100.0
    ).select("l_orderkey")
    assert "NO_PUSHDOWN" in _codes(bad)


def test_pushable_predicate_is_clean(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    good = li.filter(F.col("l_quantity") > 10).select("l_orderkey")
    assert "NO_PUSHDOWN" not in _codes(good)


def test_wide_scan_flagged(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # force every column through the plan
    assert "WIDE_SCAN" in {
        f.code for f in advise(li.distinct(), max_scan_cols=8)
    }


def test_row_udf_flagged(spark, sf_dir):
    from pyspark.sql.types import LongType

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    slow = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    bad = li.select(slow("l_orderkey").alias("k"))
    assert "ROW_PYTHON_UDF" in _codes(bad)


def test_broadcast_scaled_flagged(spark, sf_dir):
    """A forced broadcast hint over an SF-scaled dim (customer grows
    with the corpus) OOMs at cluster scale — flagged."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bad = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert "BROADCAST_SCALED" in _codes(bad)
    # scale-proportional filters don't bound it either
    bad2 = o.join(
        F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
        o.o_custkey == c.c_custkey,
    )
    assert "BROADCAST_SCALED" in _codes(bad2)


def test_broadcast_scaled_accepts_bounded_shapes(spark, sf_dir):
    """Schema-bounded relations keep their hints: nation (25 rows),
    post-aggregation survivor sets, and id-pinned query sets."""
    from frames_spark.operators.joins import dim_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # un-hinted dim_join: AQE sizes it — clean
    assert "BROADCAST_SCALED" not in _codes(
        dim_join(o, c, o.o_custkey == c.c_custkey)
    )
    # bounded table (nation) force-hinted — clean
    assert "BROADCAST_SCALED" not in _codes(
        dim_join(c, n, c.c_nationkey == n.n_nationkey, bounded=True)
    )
    # post-aggregation survivor set — clean
    stats = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert "BROADCAST_SCALED" not in _codes(
        o.join(F.broadcast(stats), "o_custkey")
    )
    # id-pinned query set over a scaled table — clean
    qs = emb.filter(F.col("vec_id") < 5)
    assert "BROADCAST_SCALED" not in _codes(
        emb.crossJoin(F.broadcast(qs.select(F.col("embedding").alias("q"))))
    )


def test_registered_queries_pass_the_gate(spark, sf_dir):
    """The engine's own flagship plans clear the advisor."""
    from frames_spark.queries import QUERIES

    for name in ("q_group_fold", "q_top_unshipped", "q_forecast_revenue"):
        assert_clean(QUERIES[name](spark, sf_dir))


def test_assert_clean_raises_with_detail(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/region.parquet")
    b = spark.read.parquet(f"{sf_dir}/nation.parquet")
    with pytest.raises(AssertionError, match="CARTESIAN"):
        assert_clean(a.crossJoin(b.hint("shuffle_replicate_nl")))


# Queries whose filters are KNOWN non-scan-eligible by design: hash-
# membership sampling (md5 over the key — the whole point is a
# layout-invariant scan-STAGE filter), function-of-column guards
# (size(embedding)=d), and computed join/diff keys. The advisor
# correctly reports these as not scan-eligible; everything else in
# the registry must stay clean.
KNOWN_UNPUSHABLE = {
    # quality gate filters the EXTRACTED text (html_to_text regexp
    # chain output), a derived expression no scan can push
    "q_html_pipeline",
    # ntok > 0 guard is size(split(...)) — derived, not scan-eligible
    "q_lix",
    "q_cross_source_dups",
    "q_cust_order_dist",
    "q_embed_centroids",
    "q_join_multi",
    "q_label_purity",
    "q_melt",
    "q_missing_drop",
    "q_sample_hash",
    "q_sample_estimate",
    "q_table_diff",
    # c_custkey % 7 = 0 deterministic-sample filter — modulo is a
    # derived expression, intentionally scan-stage (the q_sample_hash
    # class); the corpus it feeds is the planted edit-join vocabulary
    "q_edit_join",
    "q_entity_clusters",
    "q_edit_join_eval",
    # the held-out doc_id % 5 split: constraint propagation copies it
    # onto the langid branch's scan — modulo is the intentional
    # layout-invariant split (the q_sample_hash class)
    "q_mcnemar_nb_vs_langid",
    # user_id % 4 modulo population splits — the natural splits of the
    # synthetic corpus all give Jaccard ~1.0, so the overlap demo uses
    # the layout-invariant modulo class (same as q_sample_hash)
    "q_kmv_overlap",
    # doc_id % 5 held-out train/test split inside nb_confusion — the
    # same intentional modulo class as q_mcnemar_nb_vs_langid; it was
    # previously masked from the advisor by the persisted bucketization
    # (r7 gotcha: a .persist() blocks pushdown analysis on its branch)
    "q_nb_confusion",
}


def test_registry_wide_advisor_sweep(spark, sf_dir):
    from frames_spark.queries import QUERIES

    noisy = {}
    for name, fn in QUERIES.items():
        # Analyze every query in the same transparent, uncached state:
        # builders register persists (tie_cache keeps them alive while
        # the result lives, and DataFrames sit in reference cycles, so
        # finalizer timing is GC-dependent — the r8 sweep used a
        # gc.collect() here). clearCache() expresses the intent
        # directly and deterministically: no InMemoryRelation from a
        # PRIOR query's lineage can substitute into this plan. This is
        # also what unmasked q_nb_confusion's held-out split below:
        # the persist used to hide its modulo filter from the advisor.
        spark.catalog.clearCache()
        findings = advise(fn(spark, sf_dir))
        unexpected = [
            f
            for f in findings
            if not (f.code == "NO_PUSHDOWN" and name in KNOWN_UNPUSHABLE)
        ]
        if unexpected:
            noisy[name] = unexpected
    assert not noisy, noisy


def test_broadcast_scaled_per_leaf_no_whitewash(spark, sf_dir):
    """A bounding Aggregate on ONE branch of a join inside the hint
    must not whitewash the unbounded SF-scaled scan on the OTHER
    branch — boundedness is per scaled Relation leaf, on the path
    between the hint and that specific scan."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # inside the hint: (aggregated customer) JOIN (raw full customer)
    agg = c.groupBy("c_nationkey").agg(F.count("*").alias("n"))
    raw = c.select(F.col("c_nationkey").alias("nk"), "c_custkey")
    inner = agg.join(raw, agg.c_nationkey == raw.nk)
    bad = o.join(F.broadcast(inner), o.o_custkey == inner.c_custkey)
    assert "BROADCAST_SCALED" in {f.code for f in advise(bad)}
    # sanity: the fully-bounded shape is still accepted
    ok = o.join(
        F.broadcast(agg), o.o_custkey == agg.c_nationkey
    )
    assert "BROADCAST_SCALED" not in {f.code for f in advise(ok)}

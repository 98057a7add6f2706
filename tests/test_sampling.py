"""Deterministic hash sampling: reproducibility, entity-consistency,
stratified fractions, and the no-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)
from frames_spark.plans.explain import formatted_plan
from frames_spark.sources.tables import load_table


def test_hash_sample_partition_invariant(spark, sf_dir):
    """Same rows regardless of physical layout — the property
    df.sample() does NOT have."""
    o = load_table(spark, sf_dir, "orders")
    base = {r.o_orderkey for r in hash_sample(o, "o_orderkey", 0.1, seed=7).collect()}
    shuffled = {
        r.o_orderkey
        for r in hash_sample(o.repartition(17), "o_orderkey", 0.1, seed=7).collect()
    }
    assert base == shuffled and 0 < len(base) < o.count()


def test_hash_sample_fraction_approximate(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    kept = hash_sample(o, "o_orderkey", 0.2, seed=1).count()
    assert 0.1 * n < kept < 0.3 * n


def test_hash_sample_entity_consistent(spark, sf_dir):
    """Sampling lineitem by l_orderkey keeps or drops whole orders."""
    li = load_table(spark, sf_dir, "lineitem")
    kept_orders = (
        hash_sample(li, "l_orderkey", 0.1, seed=3)
        .select("l_orderkey")
        .distinct()
        .collect()
    )
    kept = {r.l_orderkey for r in kept_orders}
    # every lineitem row of a kept order is kept
    full = li.filter(F.col("l_orderkey").isin(list(kept)[:50])).count()
    sampled = (
        hash_sample(li, "l_orderkey", 0.1, seed=3)
        .filter(F.col("l_orderkey").isin(list(kept)[:50]))
        .count()
    )
    assert full == sampled


def test_split_disjoint_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = train_test_split(docs, "doc_id", 0.25, seed="s")
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("train", 0) + counts.get("test", 0) == docs.count()
    assert counts.get("test", 0) > 0 and counts.get("train", 0) > 0


def test_stratified_fractions(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    out = stratified_hash_sample(
        c, "c_mktsegment", "c_custkey", {"AUTOMOBILE": 1.0, "BUILDING": 0.0},
        default_fraction=0.0, seed=9,
    )
    got = {r.c_mktsegment for r in out.select("c_mktsegment").distinct().collect()}
    n_auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").count()
    assert got == {"AUTOMOBILE"} and out.count() == n_auto


def test_sample_is_scan_stage_filter(spark, sf_dir):
    """The membership predicate must not introduce a shuffle: the plan
    is Scan -> Filter -> Project with no Exchange."""
    o = load_table(spark, sf_dir, "orders")
    plan = formatted_plan(hash_sample(o, "o_orderkey", 0.1).select("o_orderkey"))
    assert "Exchange" not in plan

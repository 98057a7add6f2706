"""Centroid reassembly, weighted-sampling bias, sweep-line concurrency."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from frames_spark.operators.rangejoin import interval_concurrency
from frames_spark.operators.sampling import weighted_sample, weighted_sample_stratified
from frames_spark.similarity.centroid import centroids, component_means
from frames_spark.sources.tables import load_table


def test_centroid_matches_numpy_mean(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.label: r.centroid for r in centroids(emb, "label").collect()}
    rows = emb.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    for label, vecs in by_label.items():
        # micros quantization: each component within 1e-6/2 per element
        want = np.array(vecs, dtype=np.float64).mean(axis=0)
        assert np.allclose(got[label], want, atol=1e-6)
        assert len(got[label]) == len(vecs[0])


def test_component_means_long_form_matches_array_form(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    long = component_means(emb, "label").collect()
    arr = {r.label: r.centroid for r in centroids(emb, "label").collect()}
    for r in long:
        assert arr[r.label][r.pos] == r.mean


def test_weighted_sample_prefers_heavy_rows(spark):
    # weights 1000:1 — the heavy half should dominate the sample
    rows = [(i, 1000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    picked = [r.id for r in weighted_sample(df, "id", "w", k=20, seed=7).collect()]
    assert len(picked) == 20 and len(set(picked)) == 20
    assert sum(1 for i in picked if i < 50) >= 15
    # deterministic: same seed -> same set, new seed -> (almost surely) different
    again = [r.id for r in weighted_sample(df, "id", "w", k=20, seed=7).collect()]
    assert set(picked) == set(again)
    other = [r.id for r in weighted_sample(df, "id", "w", k=20, seed=8).collect()]
    assert set(picked) != set(other)


def test_weighted_sample_stratified_k_per_stratum(spark):
    rows = [(s, i, i + 1) for s in ("a", "b") for i in range(30)]
    df = spark.createDataFrame(rows, "stratum: string, id: long, w: long")
    out = weighted_sample_stratified(df, "stratum", "id", "w", k=5, seed=1)
    counts = {r.stratum: r.n for r in out.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 5, "b": 5}


def test_concurrency_brute_force(spark):
    base = dt.datetime(2024, 1, 1)
    # overlapping, touching, and nested intervals across a day boundary
    iv = [
        (0, 60), (30, 90), (60, 120),          # chain: touch at 60
        (100, 100),                             # empty interval
        (1380, 1500), (1410, 1440),            # crosses midnight bucket
    ]
    rows = [
        (base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
        for s, e in iv
    ]
    df = spark.createDataFrame(rows, "s: timestamp, e: timestamp")
    got = {r.t: r.concurrent for r in interval_concurrency(df, "s", "e").collect()}
    # brute force at every change point: count open [s, e) intervals
    points = sorted({t for r in iv for t in r})
    for p in points:
        want = sum(1 for s, e in iv if s <= p < e)
        tp = base + dt.timedelta(minutes=p)
        assert got[tp] == want, (p, got[tp], want)
    # never negative, ends at zero
    assert min(got.values()) >= 0
    assert got[max(got)] == 0

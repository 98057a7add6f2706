"""tie_cache liveness across derivations (operators/caching.py).

The chaining caveat is a silent-recompute class: a registered query
that derives from a tie_cache result and drops the original releases
the caches (CPython finalizes on refcount zero) BEFORE the driver's
action, and the action recomputes every cached stage. Found live in
r11: q_triplet_mining / q_hard_negatives / q_incremental_dedup all
executed with ZERO InMemoryRelation in their plans. These tests pin
the fix (caching.retie) by asserting the cache is still in the plan
of the frame the query RETURNS, after a forced gc pass."""

from __future__ import annotations

import gc

import pytest

from frames_spark.queries import QUERIES

# every registered query that caches internally AND derives past the
# tie_cache result before returning (the retie sites)
CACHE_CHAINED = [
    "q_triplet_mining",
    "q_hard_negatives",
    "q_hard_positives",
    "q_incremental_dedup",
    "q_incremental_dedup_inc",
    # q_incremental_clusters is NOT here: its CC/update_components
    # stages iterate eagerly at build time, consuming the caches
    # before the query returns — nothing left to keep alive.
    "q_nb_confusion",
    "q_dsir",
    "q_dsir_sample",
    "q_dsir_by_source",
]


@pytest.mark.parametrize(
    "key", [k for k in CACHE_CHAINED if k in QUERIES]
)
def test_cache_survives_to_materialization(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    gc.collect()  # would fire the dropped finalizers pre-fix
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan or (
        "TableCacheQueryStage" in plan
    ), f"{key}: caches released before materialization"


def test_retie_releases_after_outer_frame_dies(spark):
    """retie keeps the inner tie_cache result alive exactly as long
    as the derived frame, then the inner finalizer unpersists."""
    import pyspark.sql.functions as F

    from frames_spark.operators.caching import retie, tie_cache

    cached = spark.range(100).withColumn("x", F.col("id") * 2).persist()
    cached.count()
    inner = tie_cache(cached.filter("x > 10"), cached)
    outer = retie(inner.withColumnRenamed("x", "y"), inner)
    del inner
    gc.collect()
    assert cached.storageLevel.useMemory  # still cached: outer holds it
    del outer
    gc.collect()
    assert not cached.storageLevel.useMemory  # released with the chain

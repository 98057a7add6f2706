"""Runtime (bloom) filter join pruning — the 100 TB shuffle-join
companion to broadcast pruning.

When a selective dimension filters a shuffle join, Spark can inject
a bloom filter built from the dimension's join keys as a
``might_contain`` predicate on the FACT side scan — rows that cannot
match are dropped before the shuffle, which is the difference
between shuffling 100 TB and shuffling the 2% that survives. This
is Catalyst's InjectRuntimeFilter rule; it only engages when the
fact side is big enough to be worth it, so on laptop-scale test
data the thresholds must be lowered to see (and test) the plan.

Usage::

    with runtime_bloom_filters(spark):
        fact.join(selective_dim, ...)   # plan shows might_contain

Defaults here keep Spark's production thresholds; tests pass
``application_side_threshold="0"`` to force injection on small data.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def runtime_bloom_filters(
    spark: SparkSession,
    application_side_threshold: str | None = None,
    creation_side_threshold: str | None = None,
):
    """Enable runtime bloom-filter join pruning, restoring prior conf
    values on exit. ``None`` thresholds keep Spark's defaults (10GB
    application side / 10MB creation side) — production settings;
    override only to demonstrate the plan on small data."""
    wanted = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            application_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_threshold,
    }
    saved: dict[str, str | None] = {}
    for k, v in wanted.items():
        if v is None:
            continue
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)

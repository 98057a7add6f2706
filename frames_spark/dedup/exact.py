"""Exact deduplication.

Hash-groupBy on the normalized-text fingerprint: one shuffle keyed by
a 128-bit md5 — uniformly distributed, so no skew; at 100 TB this is
the cheapest possible dedup (no candidate generation at all).
Canonical row = min id per fingerprint (deterministic keep rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.text import fingerprint


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-fingerprint canonical id + duplicate count."""
    from frames_spark.operators.core import spread

    return (
        spread(df).select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated frame: keep the canonical row per fingerprint.

    Implemented as a self-semi-join on (fp, min id) rather than a
    window, so the heavy payload shuffles once on the uniform hash.
    """
    groups = exact_dedup_groups(df, id_col, text_col)
    keep = groups.select(F.col("canonical_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")

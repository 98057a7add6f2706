"""MinHash + LSH near-duplicate candidate generation.

Pipeline (all built-in ops, one explode + two shuffles):
  shingle -> k seeded min-hashes (signature) -> band keys ->
  equi-join on band key -> candidate pairs (-> optional exact verify).

At 100 TB the band join is the whole point: candidates come from
hash-bucket collisions, never a cross join. Band key cardinality is
huge (md5 of r concatenated 60-bit values), so bucket skew is
negligible; the shuffle is keyed by band hash.

Hashes are the portable md5-based ``hash60`` (SURVEY.md §4) so the
DuckDB oracle reproduces signatures bit-for-bit; flip ``fast=True``
for xxhash64 in engine-internal runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.jaccard import shingle_index
from frames_spark.functions.hashing import hash60


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    fast: bool = False,
) -> DataFrame:
    """(doc, sig_i, min_hash) — long form, one row per hash seed."""
    index = shingle_index(df, id_col, text_col, n)
    seeded = index.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("sig_i"),
        "shingle",
    )
    return (
        seeded.withColumn(
            "h",
            hash60(
                F.concat(F.col("sig_i").cast("string"), F.lit("|"), F.col("shingle")),
                seed="mh",
                fast=fast,
            ),
        )
        .groupBy("doc", "sig_i")
        .agg(F.min("h").alias("min_hash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """Candidate pairs from banded signature collisions.

    A pair collides if ALL ``rows_per_band`` signature values in some
    band match — the band key is the concatenation of that band's
    values, so one equi-join finds all collisions.
    """
    banded = (
        signatures.withColumn("band", F.floor(F.col("sig_i") / rows_per_band))
        .groupBy("doc", "band")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.struct("sig_i", "min_hash")))
                .getField("min_hash")
                .cast("array<string>"),
            ).alias("band_key")
        )
    )
    a = banded.select("band", "band_key", F.col("doc").alias("doc_a"))
    b = banded.select("band", "band_key", F.col("doc").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

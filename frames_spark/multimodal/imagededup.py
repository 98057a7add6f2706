"""Perceptual image near-duplicate detection (dHash + banded
Hamming buckets) — the image leg of the dedup ladder.

Pipeline, all bounded:
  1. decode + dHash per image (codecs.image_dhash — REAL stdlib/numpy
     math for PNM payloads, no PIL) inside an Arrow-batched
     mapInPandas: bytes never leave the executors;
  2. candidate generation EXACTLY like text SimHash: the 64-bit hash
     splits into ``bands`` fixed bit-slices; two images sharing ANY
     slice become candidates (a pair within Hamming distance d
     collides on at least one of b bands when d < b). One groupBy per
     band-key, in-array i<j expansion, ``max_bucket`` guard;
  3. exact verify: bit_count(a XOR b) <= max_hamming, JVM-side.

Never an all-pairs comparison: a corpus of N images generates
candidates only from bucket collisions, the same shape every other
dedup tier uses.

Frames ref: no equivalent (multimodal extension, SURVEY.md §2b).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["image_hashes", "image_neardup_pairs"]


def image_hashes(
    df: DataFrame, id_col: str = "file_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, dhash): perceptual 64-bit dHash per image, decoded in the
    executors (Arrow batches; bad/undecodable payloads yield NULL)."""
    schema = f"{id_col} string, dhash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from frames_spark.multimodal.codecs import image_dhash

        for pdf in batches:
            out_id, out_h = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = image_dhash(bytes(payload))
                except Exception:
                    h = None
                out_id.append(i)
                out_h.append(h)
            yield pd.DataFrame({id_col: out_id, "dhash": out_h})

    return df.select(
        F.col(id_col).cast("string").alias(id_col), payload_col
    ).mapInPandas(run, schema=schema)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "file_id",
    max_hamming: int = 8,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming) with hamming <= max_hamming.

    64 must divide by ``bands``; candidate recall is exact for
    hamming < bands (pigeonhole: some band is untouched) and high
    for hamming <= max_hamming with the default 4x16 split."""
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.filter(F.col("dhash").isNotNull()).select(
        F.col(id_col).alias("id"), "dhash"
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("bits"),
            )
            for b in range(bands)
        ]
    )
    banded = h.select("id", "dhash", F.explode(band_structs).alias("b")).select(
        "id", "dhash", F.col("b.band").alias("band"), F.col("b.bits").alias("bits")
    )
    buckets = (
        banded.groupBy("band", "bits")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("dhash")))
            ).alias("ms")
        )
        .filter(F.size("ms") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket)
    pair_expr = F.expr(
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)),"
        " y -> struct(x.id AS id_a, y.id AS id_b,"
        " x.dhash AS ha, y.dhash AS hb))))"
    )
    cands = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.*")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id_a").alias(f"{id_col}_a"), F.col("id_b").alias(f"{id_col}_b"), "hamming")
    )

"""Deterministic hash-based sampling and dataset splitting.

`df.sample()` is seed-dependent on partition layout, so the same call
can return different rows after a repartition or a Spark upgrade —
useless for reproducible training corpora. These operators decide
membership from a content hash of a stable key (`hash60`, md5-based):
the same row lands in the same split on any engine, any partitioning,
any cluster size. That also makes them oracle-expressible in plain
SQL, and at 100 TB they are pure scan expressions — no shuffle, no
driver coordination, fully pushed into the parquet scan stage.

Frames ref: no direct analog (Frames samples in-core); this is part
of the training-data-pipeline surface (SURVEY.md §2b).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.hashing import hash60, hash60_sql

# Membership is decided on hash60 % SCALE < fraction * SCALE: integer
# compare, exact in both engines, resolution 1e-6.
_SCALE = 1_000_000


def _bucket(key: Column, seed: int | str) -> Column:
    return hash60(key.cast("string"), seed=seed) % _SCALE


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, seed: int | str = 0
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by content hash of `key`.

    Deterministic across runs, partitionings, and engines; rows with
    equal keys are kept or dropped together (sampling is by entity,
    not by physical row).
    """
    key = F.col(key) if isinstance(key, str) else key
    return df.filter(_bucket(key, seed) < int(fraction * _SCALE))


def hash_sample_sql(key_expr: str, fraction: float, seed: int | str = 0) -> str:
    """DuckDB twin of :func:`hash_sample`'s predicate."""
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)", seed=seed)
    return f"({h} % {_SCALE}) < {int(fraction * _SCALE)}"


def train_test_split(
    df: DataFrame,
    key: Column | str,
    test_fraction: float = 0.1,
    seed: int | str = 0,
    alias: str = "split",
) -> DataFrame:
    """Add a `split` column ('train' / 'test') by content hash.

    An entity (key) always lands in the same split — no leakage when
    the same document appears in multiple shards, no drift between
    pipeline runs.
    """
    key = F.col(key) if isinstance(key, str) else key
    is_test = _bucket(key, seed) < int(test_fraction * _SCALE)
    return df.withColumn(alias, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def stratified_hash_sample(
    df: DataFrame,
    strata: Column | str,
    key: Column | str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int | str = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common
    languages, keep all rare ones).

    The per-stratum threshold is a CASE expression — still a pure
    scan-stage filter, no shuffle, unlike `sampleBy` which is
    partition-layout-dependent.
    """
    strata = F.col(strata) if isinstance(strata, str) else strata
    key = F.col(key) if isinstance(key, str) else key
    thresh: Column = F.lit(int(default_fraction * _SCALE))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(strata == value, F.lit(int(frac * _SCALE))).otherwise(thresh)
    return df.filter(_bucket(key, seed) < thresh)


def stratified_hash_sample_sql(
    strata_expr: str,
    key_expr: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int | str = 0,
) -> str:
    """DuckDB twin of :func:`stratified_hash_sample`'s predicate."""
    cases = " ".join(
        f"WHEN {strata_expr} = '{v}' THEN {int(f * _SCALE)}"
        for v, f in sorted(fractions.items())
    )
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)", seed=seed)
    return (
        f"({h} % {_SCALE}) < (CASE {cases} ELSE {int(default_fraction * _SCALE)} END)"
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
# each row draws a deterministic uniform u from its content hash and
# races with key ln(u)/w; the k LARGEST keys win. Selection
# probability is proportional to weight, the race is embarrassingly
# parallel (pure scan expression), and the winners are found with one
# top-k — no shuffle of the losers, reproducible on any layout.
# Works per-stratum with a window instead of the global sort.
# ---------------------------------------------------------------------------


def _race_key(key: Column, weight: Column, seed: int | str) -> Column:
    # u in (0, 1]: (hash60 + 1) / 2^60; key = ln(u)/w, maximized.
    u = (hash60(key.cast("string"), seed=seed) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    return F.log(u) / weight


def _race_key_sql(key_expr: str, weight_expr: str, seed: int | str) -> str:
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)", seed=seed)
    return f"ln(CAST({h} + 1 AS DOUBLE) / {float(1 << 60)}) / ({weight_expr})"


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    seed: int | str = 0,
) -> DataFrame:
    """k rows sampled without replacement with probability ~ weight.
    Rows with weight <= 0 never selected. Deterministic in (key, seed).
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    return (
        df.filter(w > 0)
        .withColumn("__race", _race_key(F.col(key), w, seed))
        .orderBy(F.desc("__race"), key)
        .limit(k)
        .drop("__race")
    )


def weighted_sample_stratified(
    df: DataFrame,
    stratum: str,
    key: str,
    weight: Column | str,
    k: int,
    seed: int | str = 0,
) -> DataFrame:
    """k weighted winners per stratum: one window top-k keyed by the
    stratum instead of a global sort."""
    from pyspark.sql import Window

    w = F.col(weight) if isinstance(weight, str) else weight
    race = _race_key(F.col(key), w, seed)
    rn = F.row_number().over(
        Window.partitionBy(stratum).orderBy(F.desc("__race"), key)
    )
    return (
        df.filter(w > 0)
        .withColumn("__race", race)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= k)
        .drop("__race", "__rn")
    )

"""Versioned parquet tables: snapshot isolation + time travel
without a transactional format.

The Delta/Iceberg pattern reduced to its filesystem core: every
write lands in a NEW immutable ``v=N`` directory and a tiny
``_LATEST`` pointer file is atomically renamed into place. Readers
therefore never observe a half-written table (they resolve the
pointer once, then read an immutable snapshot), concurrent readers
of older versions are untouched by later writes, and any historical
version stays queryable until vacuumed — the three properties
merge_upsert's in-place swap cannot give. On real deployments a
table format provides this natively; this layer is the plain-
parquet-on-a-filesystem equivalent, and the API (write / upsert /
read_at / history / vacuum) mirrors that world so pipelines can
swap in Delta later without reshaping.

Writes serialize per table (last pointer wins); this is a
single-writer pattern, like the sinks it builds on.

Frames ref: no equivalent (lakehouse extension, SURVEY.md §2c).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_versioned",
    "upsert_versioned",
    "read_versioned",
    "versions",
    "vacuum",
]

_VDIR = re.compile(r"^v=(\d+)$")


def _pointer(table_dir: str) -> str:
    return os.path.join(table_dir, "_LATEST")


def versions(table_dir: str) -> list[int]:
    """All snapshot versions present on disk, ascending."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _latest(table_dir: str) -> int | None:
    try:
        with open(_pointer(table_dir)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        vs = versions(table_dir)
        return vs[-1] if vs else None


def _publish(table_dir: str, version: int) -> None:
    tmp = _pointer(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _pointer(table_dir))  # atomic pointer flip


def write_versioned(df: DataFrame, table_dir: str) -> int:
    """Write a NEW snapshot version and publish it; returns the
    version number. The previous snapshot stays readable."""
    os.makedirs(table_dir, exist_ok=True)
    cur = _latest(table_dir)
    nxt = (cur or 0) + 1
    df.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={nxt}"))
    _publish(table_dir, nxt)
    return nxt


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The published snapshot (or an explicit historical version —
    time travel)."""
    v = version if version is not None else _latest(table_dir)
    if v is None:
        raise FileNotFoundError(f"no published version under {table_dir}")
    path = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {v} not found under {table_dir}")
    return spark.read.parquet(path)


def upsert_versioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> int:
    """MERGE INTO as a snapshot write: survivors (left-anti on keys)
    + updates land in version N+1; version N is untouched, so a
    failed merge leaves the table exactly as it was and history
    keeps the pre-merge state queryable."""
    current = read_versioned(spark, table_dir)
    survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    return write_versioned(survivors.unionByName(updates), table_dir)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the
    published one); returns the versions removed."""
    vs = versions(table_dir)
    published = _latest(table_dir)
    keep = set(vs[-keep_last:]) | ({published} if published is not None else set())
    removed = []
    for v in vs:
        if v not in keep:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return removed

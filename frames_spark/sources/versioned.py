"""Versioned parquet tables: snapshot isolation + time travel
without a transactional format.

The Delta/Iceberg pattern reduced to its filesystem core: every
write lands in a NEW immutable ``v=N`` directory and a tiny
``_LATEST`` pointer file is renamed into place. Readers therefore
never observe a half-written table (they resolve the pointer once,
then read an immutable snapshot), concurrent readers of older
versions are untouched by later writes, and any historical version
stays queryable until vacuumed — the three properties
merge_upsert's in-place swap cannot give. On real deployments a
table format provides this natively; this layer is the plain-
parquet-on-a-filesystem equivalent, and the API (write / upsert /
read_at / history / vacuum) mirrors that world so pipelines can
swap in Delta later without reshaping.

Cluster-FS honesty: ALL pointer and listing I/O goes through the
Hadoop FileSystem API resolved from the table path itself, so the
layer behaves identically on ``file://``, ``hdfs://`` and ``s3a://``
— the same filesystem the snapshot data is written through. (A
driver-local ``os`` fallback exists only for scheme-less local paths
when no Spark JVM is running; any URI-scheme path without a session
raises with a deploy hint instead of silently reading an empty local
dir.) Pointer-flip atomicity: on HDFS / local FS ``rename`` is
atomic; the pre-rename delete of the old pointer opens a tiny window
with no pointer, which readers survive because ``_latest`` falls
back to the max ``v=N`` directory — the published version is never
younger than the pointer. On S3A rename is copy+delete; the pointer
is a single small object so the window is equally benign.

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
_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _active_spark(spark: SparkSession | None) -> SparkSession | None:
    if spark is not None:
        return spark
    return SparkSession.getActiveSession()


def _require_local(table_dir: str, op: str) -> str:
    """os-fallback guard: only scheme-less (or file://) paths may use
    driver-local I/O; anything else without a JVM is a deploy error."""
    if _SCHEME.match(table_dir):
        if table_dir.startswith("file://"):
            return table_dir[len("file://") :]
        raise RuntimeError(
            f"versioned.{op}: no active SparkSession to reach"
            f" {table_dir!r} through the Hadoop FileSystem API —"
            " pass spark= (or run inside a session); driver-local os"
            " I/O would silently miss the cluster filesystem"
        )
    return table_dir


def _fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for path_str, resolved from the path's own
    scheme via the session's Hadoop configuration — the exact
    filesystem Spark's parquet writer uses for the snapshot data."""
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, jpath


def _pointer(table_dir: str) -> str:
    return table_dir.rstrip("/") + "/_LATEST"


def versions(table_dir: str, spark: SparkSession | None = None) -> list[int]:
    """All snapshot versions present on the table's filesystem,
    ascending."""
    spark = _active_spark(spark)
    if spark is None:
        local = _require_local(table_dir, "versions")
        if not os.path.isdir(local):
            return []
        names = os.listdir(local)
    else:
        fs, jpath = _fs(spark, table_dir)
        if not fs.exists(jpath):
            return []
        names = [st.getPath().getName() for st in fs.listStatus(jpath)]
    out = []
    for name in names:
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _latest(table_dir: str, spark: SparkSession | None = None) -> int | None:
    spark = _active_spark(spark)
    text: str | None = None
    if spark is None:
        try:
            with open(_pointer(_require_local(table_dir, "latest"))) as fh:
                text = fh.read()
        except FileNotFoundError:
            text = None
    else:
        fs, jptr = _fs(spark, _pointer(table_dir))
        if fs.exists(jptr):
            stream = fs.open(jptr)
            try:
                jvm = spark._jvm  # noqa: SLF001
                reader = jvm.java.io.BufferedReader(
                    jvm.java.io.InputStreamReader(stream, "UTF-8")
                )
                text = reader.readLine()
            finally:
                stream.close()
    if text is not None:
        try:
            return int(text.strip())
        except ValueError:
            pass
    vs = versions(table_dir, spark)
    return vs[-1] if vs else None


def _publish(
    table_dir: str, version: int, spark: SparkSession | None = None
) -> None:
    spark = _active_spark(spark)
    if spark is None:
        ptr = _pointer(_require_local(table_dir, "publish"))
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, ptr)  # atomic pointer flip
        return
    fs, jptr = _fs(spark, _pointer(table_dir))
    _, jtmp = _fs(spark, _pointer(table_dir) + ".tmp")
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(str(version), "ascii"))
    finally:
        out.close()
    # HDFS rename refuses an existing destination: drop the old
    # pointer first. The no-pointer window is benign (_latest falls
    # back to the max v=N directory, which is >= the old pointer).
    if fs.exists(jptr):
        fs.delete(jptr, False)
    fs.rename(jtmp, jptr)


def write_versioned(df: DataFrame, table_dir: str) -> int:
    """Write a NEW snapshot version and publish it; returns the
    version number. The previous snapshot stays readable."""
    spark = df.sparkSession
    fs, jpath = _fs(spark, table_dir)
    fs.mkdirs(jpath)
    cur = _latest(table_dir, spark)
    nxt = (cur or 0) + 1
    df.write.mode("overwrite").parquet(table_dir.rstrip("/") + f"/v={nxt}")
    _publish(table_dir, nxt, spark)
    return nxt


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The published snapshot (or an explicit historical version —
    time travel)."""
    v = version if version is not None else _latest(table_dir, spark)
    if v is None:
        raise FileNotFoundError(f"no published version under {table_dir}")
    path = table_dir.rstrip("/") + f"/v={v}"
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
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
    keeps the pre-merge state queryable.

    Cost honesty: this is copy-on-write at TABLE granularity — every
    upsert rewrites the full survivor set, so the per-merge cost
    grows with the table, not the update (real table formats do
    file-level COW). Right for dimension-scale tables; for
    fact-scale incremental state prefer an append+compact layout
    (see dedup/index.py's increment mode for the pattern)."""
    current = read_versioned(spark, table_dir)
    survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    return write_versioned(survivors.unionByName(updates), table_dir)


def vacuum(
    table_dir: str, keep_last: int = 2, spark: SparkSession | None = None
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the
    published one); returns the versions removed."""
    spark = _active_spark(spark)
    vs = versions(table_dir, spark)
    published = _latest(table_dir, spark)
    keep = set(vs[-keep_last:]) | ({published} if published is not None else set())
    removed = []
    for v in vs:
        if v not in keep:
            vdir = table_dir.rstrip("/") + f"/v={v}"
            if spark is None:
                shutil.rmtree(_require_local(vdir, "vacuum"))
            else:
                fs, jpath = _fs(spark, vdir)
                fs.delete(jpath, True)
            removed.append(v)
    return removed

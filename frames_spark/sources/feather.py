"""Arrow IPC (Feather v2) ingestion.

Feature stores and dataframe pipelines hand off Arrow IPC files
(``.feather`` / ``.arrow``); Spark has no built-in reader for them.
This source reads a directory of IPC files DISTRIBUTED: the built-in
``binaryFile`` source lists and ships each file's bytes to an
executor (one row per file, no driver collect), and an Arrow-batched
``mapInPandas`` decodes them with pyarrow — the bytes land in the
same Arrow memory format the transfer uses, so decode is one
zero-ish-copy pass, not a row loop.

Schema is probed ONCE from the first file by reading only its HEAD
through the Hadoop FileSystem API (both IPC formats put the schema
message first — the file format merely prefixes an 8-byte magic), so
object stores the driver OS cannot open() work AND a multi-GB shard
costs the driver one bounded 1 MiB read instead of the whole payload;
a full binaryFile fetch remains as the fallback for schemas larger
than the probe window. The schema converts via pyspark's own
arrow-schema mapping, so the result is a fully typed DataFrame and
downstream pruning/pushdown see real columns; every file is checked
against the probed schema (names AND types) before decode.

Scale notes: like every binaryFile consumer, each FILE is one task's
unit of work — shard feather exports into many moderate files (the
2 GB binaryFile cap applies). Both the random-access file format and
the streaming IPC format are accepted per file.

Frames ref: no equivalent (beyond the reference's CSV surface —
modern interchange format, SURVEY.md §2c sources).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _open_ipc(content: bytes):
    import pyarrow as pa

    try:
        return pa.ipc.open_file(pa.BufferReader(content))
    except pa.ArrowInvalid:
        return pa.ipc.open_stream(pa.BufferReader(content))


_PROBE_BYTES = 1 << 20  # schema messages are KBs; 1 MiB is generous


def _probe_head(spark: SparkSession, path_str: str) -> bytes:
    """First min(len, _PROBE_BYTES) bytes of path_str via the Hadoop
    FileSystem API — the same FS layer binaryFile itself uses, so any
    scheme works and the driver never materializes the full shard."""
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    n = min(int(fs.getFileStatus(jpath).getLen()), _PROBE_BYTES)
    stream = fs.open(jpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n)
    finally:
        stream.close()
    return bytes(data)


def read_feather(
    spark: SparkSession,
    path: str,
    glob: str = "*.feather",
    recursive: bool = False,
) -> DataFrame:
    """Typed distributed read of a directory of Arrow IPC files."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    first = files.select("path").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {glob!r} under {path}")
    # bounded schema probe: both IPC formats start with the schema
    # message (file format prefixes 8 magic bytes), so the head read
    # suffices; the full-content fetch only runs if the schema message
    # overflows the probe window
    first_path = first[0]["path"]
    head = _probe_head(spark, first_path)
    body = head[8:] if head[:6] == b"ARROW1" else head
    try:
        arrow_schema = pa.ipc.read_schema(pa.BufferReader(body))
    except pa.ArrowInvalid:
        content = (
            files.filter(files["path"] == first_path)
            .select("content")
            .limit(1)
            .collect()
        )
        arrow_schema = _open_ipc(bytes(content[0]["content"])).schema
    spark_schema = from_arrow_schema(arrow_schema)
    expect_fields = [(f.name, f.type) for f in arrow_schema]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                tbl = _open_ipc(bytes(content)).read_all()
                # full-schema drift check (names AND types): name-only
                # comparison let per-file type drift through and
                # surfaced as an opaque Arrow/pandas conversion error
                got_fields = [(f.name, f.type) for f in tbl.schema]
                if got_fields != expect_fields:
                    raise ValueError(
                        f"feather schema drift: {got_fields} "
                        f"!= {expect_fields}"
                    )
                yield tbl.to_pandas()

    return files.select("content").mapInPandas(decode, schema=spark_schema)


def write_feather_shards(
    df: DataFrame, out_dir: str, shard_rows: int = 1_000_000
) -> int:
    """Driver-side feather EXPORT for interchange with pandas/arrow
    consumers: collects in Arrow batches (never per-row) and writes
    sharded IPC files. Bounded use only — this is the handoff for
    sampled/aggregated results, not a fact-table sink (parquet is
    the fact-scale format); shard_rows bounds per-file memory."""
    import os

    import pyarrow.feather as pf

    os.makedirs(out_dir, exist_ok=True)
    tbl = df.toArrow()
    shard = 0
    for start in range(0, max(tbl.num_rows, 1), shard_rows):
        pf.write_feather(
            tbl.slice(start, shard_rows),
            os.path.join(out_dir, f"part-{shard:05d}.feather"),
        )
        shard += 1
    return shard

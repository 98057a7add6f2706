"""Arrow IPC (Feather v2) ingestion.

Feature stores and dataframe pipelines hand off Arrow IPC files
(``.feather`` / ``.arrow``); Spark has no built-in reader for them.
This source reads a directory of IPC files DISTRIBUTED: the built-in
``binaryFile`` source lists and ships each file's bytes to an
executor (one row per file, no driver collect), and an Arrow-batched
``mapInPandas`` decodes them with pyarrow — the bytes land in the
same Arrow memory format the transfer uses, so decode is one
zero-ish-copy pass, not a row loop.

Schema is probed ONCE from the first file, fetched through the same
binaryFile relation (so object stores the driver OS cannot open()
work) and converted via pyspark's own arrow-schema mapping, so the
result is a fully typed DataFrame and downstream pruning/pushdown
see real columns; every file is checked against the probed schema
(names AND types) before decode.

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
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {glob!r} under {path}")
    # schema probe through the SAME binaryFile relation (Hadoop FS
    # layer), so s3a://, hdfs://, or any store the driver OS cannot
    # open() directly all work — pyarrow still reads only the footer
    # of the fetched buffer
    arrow_schema = _open_ipc(bytes(first[0]["content"])).schema
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

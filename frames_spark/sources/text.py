"""Raw text and ORC sources.

Raw text is the zeroth format of a training-data pipeline: crawl
shards and corpus dumps arrive as plain files long before anyone
writes parquet. Two shapes:

- line-per-document (``read_text_lines``) — the common crawl-shard
  layout; each line is one record.
- file-per-document (``read_whole_files``) — licenses, books, code
  files; ``wholetext`` keeps one file = one row.

Both attach ``source_file`` from the scan metadata (no extra pass)
so provenance survives into the cleaned corpus. Document identity is
a content fingerprint (portable md5-based hash60), NOT
``monotonically_increasing_id()`` — monotonic ids change with
partition layout, which would make every downstream split/dedup
non-reproducible.

ORC round-trips through Spark's built-in reader: same predicate
pushdown / column pruning contract as parquet (asserted in tests).

Frames ref: readTable / produceTextLines (src/Frames/CSV.hs) are the
line-oriented ingest analog; Frames has no binary columnar format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frames_spark.functions.hashing import hash60


def _with_provenance(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        hash60(F.col(text_col), seed="docid").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col("_metadata.file_path").alias("source_file"),
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line: (doc_id, text, source_file).

    Distributed line-splitting — files larger than a split are read
    in parallel chunks; no driver-side pass.
    """
    return _with_provenance(spark.read.text(path), "value")


def read_whole_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (doc_id, text, source_file).

    `wholetext` makes the file the record boundary — a file never
    splits across partitions, so one giant file = one task; shard
    inputs accordingly. (Passed as the reader kwarg: DataFrameReader
    .text() re-sets its own defaults and silently clobbers a prior
    .option("wholetext", ...).)
    """
    return _with_provenance(spark.read.text(path, wholetext=True), "value")


def write_text_lines(df: DataFrame, text_col: str, path: str) -> None:
    """Write one column as raw lines (e.g. final corpus export)."""
    df.select(F.col(text_col).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)

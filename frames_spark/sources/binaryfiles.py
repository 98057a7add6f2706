"""Raw media ingestion via Spark's built-in ``binaryFile`` source.

Crawl/scrape outputs arrive as directories of image/audio/video
files; this reads them distributed (each file one row: path,
modificationTime, length, content), derives a content-hash media id
(layout- and rename-invariant, like the text ingest in text.py),
and sniffs MIME from magic bytes with pure JVM expressions — no
Python touches the payloads until an actual decoder must
(multimodal/binary.py mapInPandas).

Scale notes: binaryFile caps file size at
``spark.sql.sources.binaryFile.maxLength`` (2 GB default); media
larger than that should land in object storage with parquet
manifests instead. ``pathGlobFilter`` prunes by extension at
listing time — no payload read for filtered files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = [
    ("image/png", 1, b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", 1, b"\xff\xd8\xff"),
    ("image/gif", 1, b"GIF8"),
    ("audio/wav", 1, b"RIFF"),
    ("video/mp4", 5, b"ftyp"),
]


def sniff_mime(content) -> F.Column:
    """MIME from payload magic bytes — pure JVM expression chain."""
    expr = F.lit("application/octet-stream")
    for mime, pos, magic in reversed(_MAGIC):
        expr = F.when(
            F.substring(content, pos, len(magic)) == F.lit(magic), F.lit(mime)
        ).otherwise(expr)
    return expr


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Media frame: (media_id, payload, meta{mime,width,height,n_bytes},
    source_path). media_id = md5 content hash (stable across moves and
    re-crawls, so downstream dedup/joins survive re-ingestion).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    media_id = F.conv(F.substring(F.md5("content"), 1, 15), 16, 10).cast("long")
    return raw.select(
        media_id.alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            sniff_mime(F.col("content")).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
    )

"""XML ingest/egress on Spark 4's built-in XML data source.

Reference parity: the readTable / writeDSV family (reference
src/Frames/CSV.hs:403,518) generalized to one more interchange
format — the same contract as sources/csv.py and sources/jsonl.py:

* schema inference reads a BOUNDED driver-side sample (Frames'
  prefixInference idea, CSV.hs:164), never a full scan. Spark's own
  ``spark.read.format("xml")`` without a schema scans everything
  once just to infer — unacceptable at 100 TB. The probe pulls a
  bounded head of the FIRST file through the Hadoop FileSystem API
  (any scheme), slices out the first complete ``<rowTag>`` elements
  with stdlib streaming XML, and lets Spark's own XML inferencer
  type that sample — so the result matches exactly what full-scan
  inference would produce on those rows.
* the distributed scan always runs with an EXPLICIT schema.
* undecodable records land in ``_corrupt_record`` (PERMISSIVE — the
  Maybe-row analog of readTableMaybe) instead of failing the job.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"
_PROBE_BYTES = 4 << 20


def _probe_head(spark: SparkSession, path_str: str) -> bytes:
    """First min(len, _PROBE_BYTES) bytes via the Hadoop FileSystem
    API — same layer the scan itself uses, so any scheme works and
    the driver never materializes a full shard."""
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


def _sample_rows(head: bytes, row_tag: str, sample_rows: int) -> list[str]:
    """Serialized first ``sample_rows`` complete <row_tag> elements
    from a (possibly truncated) document head. iterparse streams —
    a truncated tail raises only after the elements we already
    banked, which is exactly the prefix semantics we want."""
    rows: list[str] = []
    try:
        for event, elem in ET.iterparse(io.BytesIO(head)):
            if event == "end" and elem.tag == row_tag:
                rows.append(ET.tostring(elem, encoding="unicode"))
                if len(rows) >= sample_rows:
                    break
    except ET.ParseError:
        pass  # truncated head: keep the complete rows seen so far
    return rows


def infer_xml_schema(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    glob: str = "*.xml",
    sample_rows: int = 1000,
) -> T.StructType:
    """Schema from a bounded prefix of the first matching file."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path")
        .limit(1)
        .collect()
    )
    if not files:
        raise ValueError(f"no files match {glob!r} under {path}")
    rows = _sample_rows(_probe_head(spark, files[0]["path"]), row_tag, sample_rows)
    if not rows:
        raise ValueError(
            f"no complete <{row_tag}> element in the first "
            f"{_PROBE_BYTES} bytes of {files[0]['path']}"
        )
    # the sample goes back through Spark's OWN XML inferencer (via a
    # driver-local temp doc), so the inferred lattice matches exactly
    # what a full-scan inference would produce on those rows —
    # schema_of_xml would type one element only
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/sample.xml"
        with open(p, "w", encoding="utf-8") as fh:
            fh.write("<rows>")
            for r in rows:
                fh.write(r)
            fh.write("</rows>")
        return (
            spark.read.format("xml").option("rowTag", row_tag).load(p).schema
        )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
    glob: str = "*.xml",
    columns: list[str] | None = None,
    permissive: bool = True,
    sample_rows: int = 1000,
) -> DataFrame:
    """Typed distributed XML read: bounded inference (unless an
    explicit ``schema`` arrives), PERMISSIVE corrupt capture."""
    if schema is None:
        schema = infer_xml_schema(spark, path, row_tag, glob, sample_rows)
    if permissive and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("pathGlobFilter", glob)
        .option(
            "mode", "PERMISSIVE" if permissive else "DROPMALFORMED"
        )
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
    )
    df = reader.load(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "error",
) -> None:
    """Distributed XML write (one <root_tag> document per task file —
    the writeDSV analog for XML)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )

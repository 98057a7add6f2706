"""CSV/DSV ingest with runtime schema inference.

Frames infers a row type from a bounded PREFIX of the file at compile
time (reference: src/Frames/CSV.hs:164 ``prefixInference``,
src/Frames/TH.hs ``tableTypes``) over the type lattice Bool < Int <
Double < Text (src/Frames/ColumnUniverse.hs CommonColumns). The Spark
analog keeps both properties that matter at 100 TB:

- inference NEVER full-scans: we read ``sample_rows`` lines (one tiny
  driver-side read), infer the lattice type per column, then issue the
  real distributed read with an EXPLICIT schema (Spark's
  ``inferSchema=True`` would scan everything — never used here);
- unparseable cells become NULL (permissive mode) — Frames'
  ``readTableMaybe`` Maybe-columns (CSV.hs:319) — or drop the row
  (DROPMALFORMED ≈ ``readTable`` skipping bad rows).

Also covered: custom separators (``readTableOpt``/``writeDSV``
CSV.hs:364,518), headerless files with caller-provided names +
per-identifier prefix (``rowGen``), Latin-1 (CSV.hs:267
``readFileLatin1Ln``), RFC-4180 quoting (CSV.hs:115), and CSV/DSV
output (CSV.hs:505 ``writeCSV``).
"""

from __future__ import annotations

import csv as _csv
import io
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Frames' lattice: Bool < Int < Double < Text (ColumnUniverse.hs).
_BOOL = {"true", "false", "t", "f"}
_INT_RE = re.compile(r"[+-]?\d+")
_FLOAT_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _cell_type(cell: str) -> str:
    s = cell.strip()
    if s == "":
        return "missing"
    if s.lower() in _BOOL:
        return "bool"
    if _INT_RE.fullmatch(s):
        try:
            v = int(s)
        except ValueError:
            return "string"
        return "long" if -(2**63) <= v < 2**63 else "double"
    if _FLOAT_RE.fullmatch(s):
        return "double"
    return "string"


_JOIN = {
    ("bool", "bool"): "bool",
    ("long", "long"): "long",
    ("double", "double"): "double",
    ("long", "double"): "double",
    ("double", "long"): "double",
}


def _join_types(a: str, b: str) -> str:
    if a == "missing":
        return b
    if b == "missing":
        return a
    if a == b:
        return a
    return _JOIN.get((a, b), "string")


_SPARK_TYPES = {
    "bool": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "missing": T.StringType(),
}


def sanitize_name(name: str) -> str:
    """Column-name sanitization (Frames.Utils.sanitizeTypeName): make
    a header cell a usable identifier."""
    cleaned = re.sub(r"[^0-9a-zA-Z_]+", "_", name.strip()).strip("_")
    if not cleaned:
        cleaned = "col"
    if cleaned[0].isdigit():
        cleaned = f"c{cleaned}"
    return cleaned


def infer_schema(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    column_names: list[str] | None = None,
    prefix: str = "",
    sample_rows: int = 1000,
    encoding: str = "UTF-8",
) -> T.StructType:
    """Infer a StructType from the first ``sample_rows`` data rows.

    The sample is a driver-side limit() on a line-oriented read — the
    distributed scan below never pays inference cost.
    """
    lines = [
        r[0]
        for r in spark.read.text(path).limit(sample_rows + 1).collect()
    ]
    if encoding.upper() not in ("UTF-8", "US-ASCII"):
        # spark.read.text decoded as UTF-8; re-read bytes via the RDD
        # API only for the tiny sample.
        raw = spark.sparkContext.binaryFiles(path).values().take(1)[0]
        text = raw.decode(encoding, errors="replace")
        lines = text.splitlines()[: sample_rows + 1]
    rows = list(_csv.reader(io.StringIO("\n".join(lines)), delimiter=sep))
    if not rows:
        raise ValueError(f"empty CSV: {path}")
    if header:
        names = [sanitize_name(c) for c in rows[0]]
        data = rows[1:]
    else:
        width = len(rows[0])
        names = list(column_names or (f"col{i}" for i in range(width)))
        data = rows
    if prefix:
        names = [f"{prefix}{n}" for n in names]
    col_types = ["missing"] * len(names)
    for row in data[:sample_rows]:
        for i, cell in enumerate(row[: len(names)]):
            col_types[i] = _join_types(col_types[i], _cell_type(cell))
    return T.StructType(
        [
            T.StructField(n, _SPARK_TYPES[t], True)
            for n, t in zip(names, col_types)
        ]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    column_names: list[str] | None = None,
    prefix: str = "",
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
    permissive: bool = True,
    encoding: str = "UTF-8",
    sample_rows: int = 1000,
    multi_line: bool = False,
) -> DataFrame:
    """Typed distributed CSV read with prefix-inferred schema.

    ``columns`` projects a subset (readTableOpt); ``permissive=True``
    yields Maybe-column NULLs for bad cells (readTableMaybe),
    ``False`` drops malformed rows (readTable's skip).

    ``multi_line=True`` parses RFC-4180 quoted fields with embedded
    newlines (reference: test/Spec.hs:217 on test/data/multiline.csv
    — the reference's line-oriented tokenizer rejects these; a full
    CSV engine must accept them). The cost at scale: a multiLine file
    cannot be split at arbitrary byte offsets (a newline may sit
    inside quotes), so Spark parses each FILE whole — keep multiline
    corpora in many moderate files, not one giant one.
    """
    if schema is None:
        schema = infer_schema(
            spark, path, sep, header, column_names, prefix, sample_rows, encoding
        )
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("encoding", encoding)
        .option("quote", '"')
        .option("escape", '"')  # RFC-4180 doubled-quote escaping
        .option("multiLine", str(multi_line).lower())
        .option("mode", "PERMISSIVE" if permissive else "DROPMALFORMED")
    )
    df = reader.csv(path)
    if columns:
        df = df.select(*columns)
    return df


def write_csv(
    df: DataFrame, path: str, sep: str = ",", header: bool = True
) -> None:
    """writeCSV/writeDSV (CSV.hs:505,518). One file per partition at
    scale; coalesce(1) yourself for a single small export."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )

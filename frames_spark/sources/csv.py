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
``readFileLatin1Ln``), RFC-4180 quoting (CSV.hs:115), CSV/DSV
output (CSV.hs:505 ``writeCSV``), and USER-EXTENSIBLE column types
(``ColumnType``) — the runtime analog of Frames' ``declareColumn`` +
``Parseable`` instances (src/Frames/TH.hs:91, demo/TutorialUsers.hs),
which let callers teach the inferencer new column types that the
typed read then applies.
"""

from __future__ import annotations

import csv as _csv
import io
import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
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


@dataclass(frozen=True)
class ColumnType:
    """A user-declared column type the inferencer can recognize —
    runtime ``declareColumn`` + ``Parseable`` (reference:
    src/Frames/TH.hs:91, demo/TutorialUsers.hs, where a custom enum
    column is taught to ``tableTypes``).

    ``predicate`` decides whether a sample cell belongs to the type;
    a column infers to this type iff EVERY non-missing sample cell
    passes (one failing cell falls back through the builtin lattice
    to string, like Frames falling back to Text). Custom types are
    tried before the builtin lattice, most-specific-first in the
    order given, so an enum of digit strings can still beat Int.

    ``parse`` (optional) is a JVM-side Column expression mapping the
    raw string cell to ``spark_type`` — NEVER a per-row Python UDF.
    Cells it maps to NULL behave like Maybe-column misses. Without
    ``parse``, the column is handed to Spark's reader typed as
    ``spark_type`` directly (for types Spark's CSV parser already
    understands, e.g. dates)."""

    name: str
    predicate: Callable[[str], bool]
    spark_type: T.DataType = field(default_factory=T.StringType)
    parse: Callable[[Column], Column] | None = None


_CUSTOM_META = "frames_custom"

# Offset-bearing ISO-8601 timestamp, e.g. 2003-03-30T01:10:00+02:00 /
# "... -0500" / "...Z" (reference demo/TimeZones/: parsing
# timezone-aware time columns from CSV). Parsed JVM-side by
# to_timestamp, which normalizes the instant to UTC under the pinned
# UTC session zone — probe-don't-assume on the INGEST side too.
_ZONED_RE = re.compile(
    r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?\s*"
    r"(Z|z|[+-]\d{2}:?\d{2})"
)

ZONED_TIMESTAMP = ColumnType(
    name="zoned_timestamp",
    predicate=lambda s: _ZONED_RE.fullmatch(s.strip()) is not None,
    spark_type=T.TimestampType(),
    parse=lambda c: F.to_timestamp(c),
)


def sanitize_name(name: str) -> str:
    """Column-name sanitization (Frames.Utils.sanitizeTypeName): make
    a header cell a usable identifier."""
    cleaned = re.sub(r"[^0-9a-zA-Z_]+", "_", name.strip()).strip("_")
    if not cleaned:
        cleaned = "col"
    if cleaned[0].isdigit():
        cleaned = f"c{cleaned}"
    return cleaned


def dedupe_names(names: list[str]) -> list[str]:
    """Disambiguate post-sanitization collisions with _2, _3, ...
    suffixes.

    ``sanitize_name`` maps distinct headers like ``a!`` and ``a?``
    both to ``a``; left alone, the DataFrame carries duplicate column
    names and breaks on the first select-by-name. The reference
    refuses to redefine an existing identifier for the same reason
    (reference: test/Overlap.hs:8-12 — managers.csv/employees.csv
    overlap); on Spark we keep every column and suffix instead. The
    suffixed name is itself collision-checked (a header literally
    named ``a_2`` won't be clobbered)."""
    seen: dict[str, int] = {}
    taken = set(names)
    out = []
    for n in names:
        if n not in seen:
            seen[n] = 1
            out.append(n)
            continue
        k = seen[n] + 1
        while f"{n}_{k}" in taken:
            k += 1
        seen[n] = k
        cand = f"{n}_{k}"
        taken.add(cand)
        out.append(cand)
    return out


def _cell_type_ex(cell: str, customs: list[ColumnType]) -> str:
    s = cell.strip()
    if s == "":
        return "missing"
    for c in customs:
        if c.predicate(s):
            return f"@{c.name}"
    return _cell_type(cell)


def infer_schema(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    column_names: list[str] | None = None,
    prefix: str = "",
    sample_rows: int = 1000,
    encoding: str = "UTF-8",
    custom_types: list[ColumnType] | None = None,
) -> T.StructType:
    """Infer a StructType from the first ``sample_rows`` data rows.

    The sample is a driver-side limit() on a line-oriented read — the
    distributed scan below never pays inference cost.

    ``custom_types`` extends the lattice (see ColumnType): a column
    whose every non-missing sample cell passes a custom predicate
    infers to that type; the returned StructField carries the final
    Spark type plus metadata naming the ColumnType so read_csv can
    apply its parse expression.
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
        names = dedupe_names([sanitize_name(c) for c in rows[0]])
        data = rows[1:]
    else:
        width = len(rows[0])
        names = list(column_names or (f"col{i}" for i in range(width)))
        data = rows
    if prefix:
        names = [f"{prefix}{n}" for n in names]
    customs = list(custom_types or [])
    col_types = ["missing"] * len(names)
    for row in data[:sample_rows]:
        for i, cell in enumerate(row[: len(names)]):
            col_types[i] = _join_types(col_types[i], _cell_type_ex(cell, customs))
    by_name = {c.name: c for c in customs}
    fields = []
    for n, t in zip(names, col_types):
        if t.startswith("@"):
            ct = by_name[t[1:]]
            fields.append(
                T.StructField(n, ct.spark_type, True, metadata={_CUSTOM_META: ct.name})
            )
        else:
            fields.append(T.StructField(n, _SPARK_TYPES[t], True))
    return T.StructType(fields)


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
    custom_types: list[ColumnType] | None = None,
    quoting: bool = True,
    corrupt_column: str | None = None,
) -> DataFrame:
    """Typed distributed CSV read with prefix-inferred schema.

    ``columns`` projects a subset (readTableOpt); ``permissive=True``
    yields Maybe-column NULLs for bad cells (readTableMaybe),
    ``False`` drops malformed rows (readTable's skip).

    ``custom_types`` teaches inference user-declared column types
    (ColumnType — runtime declareColumn/Parseable); columns inferred
    to a type with a ``parse`` expression are read as strings and
    converted JVM-side in the same projection, so the distributed
    scan stays single-pass with no Python in the row path.

    ``multi_line=True`` parses RFC-4180 quoted fields with embedded
    newlines (reference: test/Spec.hs:217 on test/data/multiline.csv
    — the reference's line-oriented tokenizer rejects these; a full
    CSV engine must accept them). The cost at scale: a multiLine file
    cannot be split at arbitrary byte offsets (a newline may sit
    inside quotes), so Spark parses each FILE whole — keep multiline
    corpora in many moderate files, not one giant one.

    ``quoting=False`` is Frames' NoQuoting (CSV.hs:60): the quote
    character is disabled entirely, so stray double quotes inside
    fields pass through verbatim (and embedded separators are the
    caller's problem — the NoQuoting contract).

    ``corrupt_column`` is the readTableDebug analog (CSV.hs:403):
    with permissive mode, rows that failed to parse (wrong arity, a
    cell that would not convert) carry their RAW line in this extra
    string column (NULL for clean rows), so users can SEE which rows
    failed instead of silently getting NULLed cells — the same
    channel jsonl exposes as _corrupt_record.
    """
    if corrupt_column is not None and not permissive:
        raise ValueError("corrupt_column requires permissive=True")
    registry = {c.name: c for c in custom_types or []}
    registry.setdefault(ZONED_TIMESTAMP.name, ZONED_TIMESTAMP)
    if schema is None:
        schema = infer_schema(
            spark, path, sep, header, column_names, prefix, sample_rows,
            encoding, custom_types,
        )
    # Columns bound to a ColumnType with a parse expression are read
    # as raw strings, then converted in one post-scan projection.
    reader_fields: list[T.StructField] = []
    post: dict[str, ColumnType] = {}
    for f in schema.fields:
        cname = f.metadata.get(_CUSTOM_META) if f.metadata else None
        ct = registry.get(cname) if cname else None
        if ct is not None and ct.parse is not None:
            reader_fields.append(T.StructField(f.name, T.StringType(), True))
            post[f.name] = ct
        else:
            reader_fields.append(f)
    if corrupt_column is not None:
        reader_fields.append(
            T.StructField(corrupt_column, T.StringType(), True)
        )
    reader = (
        spark.read.schema(T.StructType(reader_fields))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("encoding", encoding)
        # empty quote string -> \u0000: quoting disabled (NoQuoting)
        .option("quote", '"' if quoting else "")
        .option("escape", '"' if quoting else "")
        .option("multiLine", str(multi_line).lower())
        .option("mode", "PERMISSIVE" if permissive else "DROPMALFORMED")
    )
    if corrupt_column is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    df = reader.csv(path)
    if post:
        df = df.select(
            *[
                post[c].parse(F.col(c)).cast(post[c].spark_type).alias(c)
                if c in post
                else F.col(c)
                for c in df.columns
            ]
        )
    if columns:
        df = df.select(*columns)
    return df


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    quoting: bool = True,
) -> None:
    """writeCSV/writeDSV (CSV.hs:505,518). One file per partition at
    scale; coalesce(1) yourself for a single small export.
    ``quoting=False`` = Frames' NoQuoting (CSV.hs:60): values are
    written raw — no quoting, no escaping — for data known free of
    separators/newlines (stray quote chars survive verbatim)."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"' if quoting else "\u0000")
        .option("escape", '"' if quoting else "\u0000")
        .option("escapeQuotes", str(quoting).lower())
        .csv(path)
    )

"""Fixed-width-field reader on the Spark 4 Python DataSource API.

Frames' world is delimiter-parsed text (CSV.hs); the other classic
tabular text format is fixed-width records (mainframe extracts, COBOL
copybooks, many government datasets). Spark has no built-in FWF
reader, and the Python DataSource API is the right Spark-4 shape for
one: the source declares schema + partitions, executors parse their
own files — no driver-side materialization, one task per file
(FWF files are usually many medium extracts; a splittable offset
scheme would need fixed record LENGTHS, which the format has, so
`partitions()` could shard big files by byte range — kept file-based
here for simplicity and correctness with trailing short lines).

Usage:
    spark.dataSource.register(FixedWidthDataSource)
    df = (spark.read.format("fixedwidth")
          .option("path", "/data/extract_dir")
          .option("fields", "name:0:10,qty:10:6,price:16:8")
          .option("types", "string,int,double")
          .load())

Field spec: ``name:start:width`` (0-based byte offsets into each
line, python-sliced so short lines yield NULLs not errors). Values
are stripped; empty -> NULL; type conversion failures -> NULL
(permissive, like read_csv(permissive=True)).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

_CASTS = {
    "string": str,
    "int": int,
    "bigint": int,
    "double": float,
}


def _parse_fields(fields_opt: str, types_opt: str | None):
    specs = []
    type_names = (types_opt or "").split(",") if types_opt else []
    parts = fields_opt.split(",")
    for i, part in enumerate(parts):
        name, start, width = part.strip().split(":")
        tname = type_names[i].strip() if i < len(type_names) else "string"
        if tname not in _CASTS:
            raise ValueError(f"unsupported fixedwidth type {tname!r}")
        specs.append((name, int(start), int(width), tname))
    return specs


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FixedWidthReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.specs = _parse_fields(options["fields"], options.get("types"))
        path = options["path"]
        if os.path.isdir(path):
            self.files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
        else:
            self.files = [path]

    def partitions(self):
        # one task per file: executors read independently, the driver
        # only lists the directory
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.rstrip("\n")
                row = []
                for _name, start, width, tname in self.specs:
                    raw = line[start : start + width].strip()
                    if not raw:
                        row.append(None)
                        continue
                    try:
                        row.append(_CASTS[tname](raw))
                    except ValueError:
                        row.append(None)  # permissive: bad cell -> NULL
                yield tuple(row)


class FixedWidthDataSource(DataSource):
    """spark.read.format("fixedwidth") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self):
        specs = _parse_fields(
            self.options["fields"], self.options.get("types")
        )
        spark_types = {
            "string": T.StringType(),
            "int": T.IntegerType(),
            "bigint": T.LongType(),
            "double": T.DoubleType(),
        }
        return T.StructType(
            [T.StructField(n, spark_types[t], True) for n, _s, _w, t in specs]
        )

    def reader(self, schema: T.StructType) -> FixedWidthReader:
        return FixedWidthReader(schema, self.options)

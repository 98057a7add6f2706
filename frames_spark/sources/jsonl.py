"""JSONL (newline-delimited JSON) ingest with bounded schema inference.

The dominant interchange format for LLM training corpora. Same
100 TB contract as sources/csv.py: schema inference reads a BOUNDED
driver-side sample (Frames' prefixInference idea — reference:
src/Frames/CSV.hs:164), then the distributed scan runs with an
EXPLICIT schema. Spark's own ``spark.read.json`` without a schema
full-scans the data once just to infer — never acceptable at scale.

Type widening follows JSON's own lattice (long < double; anything
mixed -> string) and nested objects/arrays are preserved as
StructType/ArrayType. Permissive mode captures undecodable lines in
``_corrupt_record`` instead of failing the job (the Maybe-row
analog); DROPMALFORMED silently skips them.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def infer_jsonl_schema(
    spark: SparkSession,
    path: str,
    sample_rows: int = 1000,
    zoned_timestamps: bool = False,
) -> T.StructType:
    """Schema from the first ``sample_rows`` lines — one tiny
    driver-side read; the sample is parsed by Spark's own JSON
    inferencer so the result matches exactly what a full-scan
    inference would produce on those rows.

    ``zoned_timestamps=True`` turns on timestamp inference
    (``inferTimestamp``): offset-bearing ISO-8601 strings
    (2003-03-30T01:10:00+02:00, ...Z) infer as TimestampType and the
    typed read normalizes each instant to UTC under the pinned UTC
    session zone (reference demo/TimeZones/ — zoned time columns).
    Off by default: Spark disables it for inference cost, and here it
    also keeps ingest behavior explicit."""
    lines = [r[0] for r in spark.read.text(path).limit(sample_rows).collect()]
    if not lines:
        raise ValueError(f"empty JSONL: {path}")
    sample = spark.createDataFrame([(ln,) for ln in lines], "value string")
    reader = spark.read
    if zoned_timestamps:
        reader = reader.option("inferTimestamp", "true")
    return reader.json(sample.rdd.map(lambda r: r[0])).schema


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
    permissive: bool = True,
    sample_rows: int = 1000,
    zoned_timestamps: bool = False,
) -> DataFrame:
    """Typed distributed JSONL read.

    ``permissive=True`` keeps undecodable lines, whole line in
    ``_corrupt_record`` and NULLs elsewhere; ``False`` drops them.
    ``columns`` prunes top-level fields (column pruning pushes into
    the scan — unread fields are never parsed).
    ``zoned_timestamps=True`` infers offset-bearing ISO-8601 string
    fields as TimestampType (UTC-normalized instants).
    """
    if schema is None:
        schema = infer_jsonl_schema(spark, path, sample_rows, zoned_timestamps)
    if permissive and CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    reader = spark.read.schema(schema).option(
        "mode", "PERMISSIVE" if permissive else "DROPMALFORMED"
    )
    df = reader.json(path)
    if columns:
        df = df.select(*columns)
    return df


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSONL file per partition (the write layout downstream
    readers will re-split on)."""
    df.write.mode("overwrite").json(path)


def flatten_struct(df: DataFrame, col: str, sep: str = "_") -> DataFrame:
    """Promote a struct column's fields to top level (col.a -> col_a)
    — the usual first step after reading nested JSONL into a flat
    analytics schema."""
    field = next(f for f in df.schema.fields if f.name == col)
    if not isinstance(field.dataType, T.StructType):
        raise ValueError(f"{col} is not a struct: {field.dataType}")
    others = [c for c in df.columns if c != col]
    return df.select(
        *others,
        *[
            df[f"{col}.{sub.name}"].alias(f"{col}{sep}{sub.name}")
            for sub in field.dataType.fields
        ],
    )


def validate_jsonl(df: DataFrame) -> dict[str, int]:
    """(total, corrupt) line counts — the ingest health check run
    before a corpus enters the pipeline. Single pass."""
    from pyspark.sql import functions as F

    has_corrupt = CORRUPT_COL in df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("total"),
        (
            F.count(F.col(CORRUPT_COL)) if has_corrupt else F.lit(0)
        ).alias("corrupt"),
    ).first()
    return {"total": agg["total"], "corrupt": agg["corrupt"]}

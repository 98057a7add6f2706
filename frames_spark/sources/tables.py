"""Star-schema loaders for the driver testdata.

Parquet is the native format (columnar, pushdown, stats) — the 100 TB
analog of Frames' in-core column vectors (reference:
src/Frames/InCore.hs). CSV ingest lives in sources/csv.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are fixed-size; supplier/part/customer grow
# with SF but stay far below fact tables — revisit per-deployment).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver hands us an externally built SparkSession; events.parquet
    # is TIMESTAMP(NANOS), which Spark refuses to read unless this legacy
    # conf is on. It's a runtime-settable SQL conf, so set it here rather
    # than relying on session-build time (frames_spark/session.py) — the
    # conversion below then normalizes the resulting epoch-nanos long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): arrives as epoch-nanos long
    # (spark.sql.legacy.parquet.nanosAsLong); truncate to the engine's
    # native microsecond timestamps. `div` keeps the arithmetic integer-
    # exact; DuckDB's TIMESTAMP_NS -> TIMESTAMP cast truncates the same
    # way, so oracle SQL uses CAST(ts AS TIMESTAMP).
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

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
    # The driver hands us an externally built SparkSession. Two session
    # confs must hold regardless of who built it: a pinned UTC timezone
    # (NTZ<->LTZ conversion and the DuckDB oracle comparison are only
    # exact under UTC) and nanos-as-long (in case the parquet writer
    # emits TIMESTAMP(NANOS), which Spark otherwise refuses to read).
    # Both are runtime-settable SQL confs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize `ts` to the engine's native TIMESTAMP (LTZ micros),
    # whatever physical shape the writer chose:
    #   * TIMESTAMP(NANOS) -> epoch-nanos bigint (via nanosAsLong);
    #     integer-exact `div 1000` truncation matches DuckDB's
    #     TIMESTAMP_NS -> TIMESTAMP cast.
    #   * TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ;
    #     cast to TIMESTAMP is exact under the pinned UTC session zone
    #     and matches DuckDB's naive TIMESTAMP bit-for-bit.
    # Keeping both branches makes the loader robust to the test data
    # being regenerated in either shape.
    for field in df.schema.fields:
        if field.name == "ts":
            kind = field.dataType.simpleString()
            if kind == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif kind == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every star-schema table as a temp view (through the
    same footer-probing loader, so timestamp normalization applies) —
    the two-line setup for an ad-hoc `spark.sql` session:

        register_views(spark, sf_dir)
        spark.sql("SELECT ... FROM orders JOIN customer ON ...")

    Returns the view names created."""
    names = []
    for t in TABLE_NAMES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names

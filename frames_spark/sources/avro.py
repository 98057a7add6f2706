"""Avro read/write, gated on the external spark-avro module.

Avro is Spark's built-in-but-external format (shipped separately
since 2.4): the API is stable (`format("avro")`) but the jar must be
on the classpath (`--packages org.apache.spark:spark-avro_2.13:<ver>`
or a bundled deployment). These wrappers probe once and raise an
actionable error instead of Spark's generic ClassNotFound, so
pipelines fail at the call site with the fix in the message.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

_DEPLOY_HINT = (
    "spark-avro is not on the classpath. Add "
    "org.apache.spark:spark-avro_2.13:<spark-version> via "
    "spark.jars.packages (or your deployment's bundled jars) and "
    "restart the session."
)


@lru_cache(maxsize=1)
def avro_available() -> bool:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession to probe for avro")
    try:
        # the registry Spark itself consults for format("avro") —
        # a bare Class.forName probe is too loose (catalyst ships
        # some avro classes even without the data source module)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available():
        raise RuntimeError(_DEPLOY_HINT)
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available():
        raise RuntimeError(_DEPLOY_HINT)
    df.write.format("avro").mode(mode).save(path)

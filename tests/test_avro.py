"""Avro gate: roundtrip when the module is deployed, actionable
error when it is not (this container ships without spark-avro)."""

from __future__ import annotations

import pytest

from frames_spark.sources.avro import avro_available, read_avro, write_avro
from frames_spark.sources.tables import load_table


def test_avro_roundtrip_or_actionable_error(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_avro")
    if avro_available():
        write_avro(nation, path)
        assert read_avro(spark, path).count() == nation.count()
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_avro(nation, path)
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, path)

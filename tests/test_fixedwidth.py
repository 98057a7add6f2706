"""Fixed-width reader (Spark 4 Python DataSource API)."""

from __future__ import annotations

from frames_spark.sources.fixedwidth import FixedWidthDataSource


def _register(spark):
    spark.dataSource.register(FixedWidthDataSource)


def test_fixedwidth_basic(spark, tmp_path):
    p = tmp_path / "fwf"
    p.mkdir()
    (p / "part1.txt").write_text(
        "alice     12   3.5\n"
        "bob        7  10.25\n"
    )
    (p / "part2.txt").write_text(
        "carol       \n"          # short line: qty/price slices empty -> NULL
        "dave      xx   1.0\n"    # bad int -> NULL (permissive)
    )
    _register(spark)
    df = (
        spark.read.format("fixedwidth")
        .option("path", str(p))
        .option("fields", "name:0:10,qty:10:3,price:13:7")
        .option("types", "string,int,double")
        .load()
    )
    rows = {r.name: (r.qty, r.price) for r in df.collect()}
    assert rows == {
        "alice": (12, 3.5),
        "bob": (7, 10.25),
        "carol": (None, None),
        "dave": (None, 1.0),
    }
    assert [f.dataType.simpleString() for f in df.schema] == [
        "string", "int", "double"
    ]


def test_fixedwidth_one_partition_per_file(spark, tmp_path):
    import pyspark.sql.functions as F

    p = tmp_path / "fwf2"
    p.mkdir()
    for i in range(4):
        (p / f"f{i}.txt").write_text(f"row{i}      {i}\n")
    _register(spark)
    df = (
        spark.read.format("fixedwidth")
        .option("path", str(p))
        .option("fields", "name:0:10,v:10:2")
        .option("types", "string,int")
        .load()
    )
    assert df.count() == 4
    assert df.select(F.spark_partition_id()).distinct().count() == 4

"""Raw-text and ORC source round-trips + pushdown contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.plans.explain import formatted_plan, has_pushed_filters
from frames_spark.sources.tables import load_table
from frames_spark.sources.text import (
    read_orc,
    read_text_lines,
    read_whole_files,
    write_orc,
    write_text_lines,
)


def test_text_lines_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").filter(
        ~F.col("text").contains("\n")
    )
    out = str(tmp_path / "corpus_txt")
    write_text_lines(docs, "text", out)
    back = read_text_lines(spark, out)
    assert back.columns == ["doc_id", "text", "source_file"]
    want = {r.text for r in docs.select("text").collect()}
    got = {r.text for r in back.select("text").collect()}
    assert got == want


def test_text_doc_id_layout_invariant(spark, sf_dir, tmp_path):
    """Content-fingerprint ids survive a rewrite with different
    partitioning — monotonically_increasing_id would not."""
    docs = load_table(spark, sf_dir, "documents").filter(
        ~F.col("text").contains("\n")
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_text_lines(docs, "text", a)
    write_text_lines(docs.repartition(13), "text", b)
    ids_a = {r.doc_id for r in read_text_lines(spark, a).collect()}
    ids_b = {r.doc_id for r in read_text_lines(spark, b).collect()}
    assert ids_a == ids_b


def test_whole_files_one_row_per_file(spark, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "x.txt").write_text("alpha\nbeta\n")
    (d / "y.txt").write_text("gamma")
    rows = read_whole_files(spark, str(d)).collect()
    assert len(rows) == 2
    texts = {r.text for r in rows}
    assert texts == {"alpha\nbeta\n", "gamma"}
    assert all(r.source_file.endswith((".txt",)) for r in rows)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out)
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    assert {f.name: f.dataType for f in back.schema} == {
        f.name: f.dataType for f in orders.schema
    }
    # same scan contract as parquet: filter reaches the ORC scan and
    # projection prunes columns
    q = back.filter(F.col("o_totalprice") > 1000).select("o_orderkey")
    assert has_pushed_filters(q)
    plan = formatted_plan(q)
    assert "o_custkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema drift across ingest batches: mergeSchema unions the
    fields; rows from the old files read the new column as null."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        p + "/batch=1"
    )
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "v1", "v2"}
    assert merged.count() == 5
    old_rows = merged.filter(F.col("v2").isNull()).count()
    assert old_rows == 3
    # without mergeSchema the footer of ONE file wins — new column
    # may silently vanish; pin the contrast so readers reach for the flag
    plain = spark.read.parquet(p)
    assert plain.count() == 5

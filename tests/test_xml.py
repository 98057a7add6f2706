"""XML source (sources/xml.py): bounded inference, typed read,
corrupt capture, roundtrip through write_xml."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_spark.sources import xml as xml_src


def _write(path: str, body: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(body)


def test_inference_and_typed_read(spark):
    with tempfile.TemporaryDirectory() as d:
        _write(
            os.path.join(d, "a.xml"),
            "<rows>"
            "<row><id>1</id><name>alpha</name><score>1.5</score></row>"
            "<row><id>2</id><name>beta</name><score>2.0</score></row>"
            "</rows>",
        )
        schema = xml_src.infer_xml_schema(spark, d, row_tag="row")
        by_name = {f.name: f.dataType for f in schema.fields}
        assert by_name["id"] == T.LongType()
        assert by_name["name"] == T.StringType()
        assert by_name["score"] == T.DoubleType()
        df = xml_src.read_xml(spark, d, row_tag="row")
        rows = {r.id: (r.name, r.score) for r in df.collect()}
        assert rows == {1: ("alpha", 1.5), 2: ("beta", 2.0)}


def test_type_widening_across_sample(spark):
    # int then float in the same column must widen to double —
    # Spark's own inferencer lattice, applied to the bounded sample
    with tempfile.TemporaryDirectory() as d:
        _write(
            os.path.join(d, "a.xml"),
            "<rows><row><v>1</v></row><row><v>2.5</v></row></rows>",
        )
        schema = xml_src.infer_xml_schema(spark, d, row_tag="row")
        assert schema["v"].dataType == T.DoubleType()


def test_corrupt_capture_permissive(spark):
    with tempfile.TemporaryDirectory() as d:
        _write(
            os.path.join(d, "a.xml"),
            "<rows>"
            "<row><id>1</id></row>"
            "<row><id>not_a_number</id></row>"
            "</rows>",
        )
        schema = T.StructType([T.StructField("id", T.LongType(), True)])
        df = xml_src.read_xml(spark, d, row_tag="row", schema=schema)
        assert xml_src.CORRUPT_COL in df.columns
        good = df.filter(F.col(xml_src.CORRUPT_COL).isNull()).collect()
        bad = df.filter(F.col(xml_src.CORRUPT_COL).isNotNull()).collect()
        assert [r.id for r in good] == [1]
        assert len(bad) == 1 and "not_a_number" in bad[0][xml_src.CORRUPT_COL]


def test_roundtrip_write_read(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .limit(50)
    )
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "docs_xml")
        xml_src.write_xml(docs, out, row_tag="doc", root_tag="docs")
        back = xml_src.read_xml(
            spark,
            out,
            row_tag="doc",
            schema=docs.schema,
            permissive=False,
        )
        a = sorted((r.doc_id, r.lang, r.n_chars) for r in docs.collect())
        b = sorted((r.doc_id, r.lang, r.n_chars) for r in back.collect())
        assert a == b


def test_inference_is_prefix_bounded(spark):
    # a huge trailing element past the probe window must not break
    # inference of the leading rows
    with tempfile.TemporaryDirectory() as d:
        head = "".join(
            f"<row><id>{i}</id><t>w{i}</t></row>" for i in range(200)
        )
        _write(os.path.join(d, "a.xml"), f"<rows>{head}")  # truncated doc
        schema = xml_src.infer_xml_schema(spark, d, row_tag="row", sample_rows=100)
        assert {f.name for f in schema.fields} == {"id", "t"}

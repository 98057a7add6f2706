"""CSV ingest parity with Frames (readTable / tableTypes / rowGen /
readTableMaybe / writeDSV — SURVEY.md §2a csv row)."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from frames_spark.sources import csv as fcsv


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("csv")


def test_infer_clean(spark, csv_dir):
    p = str(csv_dir / "clean.csv")
    with open(p, "w") as f:
        f.write("name,age,score,flag\nalice,30,1.5,true\nbob,25,2.0,false\n")
    schema = fcsv.infer_schema(spark, p)
    assert [f.dataType for f in schema.fields] == [
        T.StringType(), T.LongType(), T.DoubleType(), T.BooleanType(),
    ]
    df = fcsv.read_csv(spark, p)
    rows = {r.name: r for r in df.collect()}
    assert rows["alice"].age == 30 and rows["bob"].score == 2.0


def test_lattice_promotion(spark, csv_dir):
    """Int column containing a float promotes to double; mixed
    bool/int degrades to string (ColumnUniverse lattice)."""
    p = str(csv_dir / "promote.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,true\n2.5,1\n")
    schema = fcsv.infer_schema(spark, p)
    assert schema.fields[0].dataType == T.DoubleType()
    assert schema.fields[1].dataType == T.StringType()


def test_no_header_with_prefix(spark, csv_dir):
    """rowGen: caller-provided names + identifier prefix."""
    p = str(csv_dir / "nohdr.csv")
    with open(p, "w") as f:
        f.write("1,foo\n2,bar\n")
    df = fcsv.read_csv(
        spark, p, header=False, column_names=["id", "label"], prefix="u_"
    )
    assert df.columns == ["u_id", "u_label"]
    assert df.count() == 2


def test_dsv_roundtrip(spark, csv_dir):
    """writeDSV + readTableOpt custom separator round trip."""
    p = str(csv_dir / "pipe_in.csv")
    out = str(csv_dir / "pipe_out")
    with open(p, "w") as f:
        f.write("x|y\n1|one\n2|two\n")
    df = fcsv.read_csv(spark, p, sep="|")
    fcsv.write_csv(df, out, sep="|")
    back = fcsv.read_csv(spark, out, sep="|")
    assert sorted(r.y for r in back.collect()) == ["one", "two"]


def test_permissive_maybe_columns(spark, csv_dir):
    """readTableMaybe: unparseable cells -> NULL, row preserved."""
    p = str(csv_dir / "dirty.csv")
    with open(p, "w") as f:
        f.write("k,v\n1,10\n2,oops\n3,30\n")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    df = fcsv.read_csv(spark, p, schema=schema, permissive=True)
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {1: 10, 2: None, 3: 30}


def test_quoted_rfc4180(spark, csv_dir):
    p = str(csv_dir / "quoted.csv")
    with open(p, "w") as f:
        f.write('a,b\n"x,y",1\n"he said ""hi""",2\n')
    df = fcsv.read_csv(spark, p)
    vals = sorted(r.a for r in df.collect())
    assert vals == ['he said "hi"', "x,y"]


def test_latin1(spark, csv_dir):
    """readFileLatin1Ln (CSV.hs:267)."""
    p = str(csv_dir / "latin1.csv")
    with open(p, "wb") as f:
        f.write("name,n\ncaf\xe9,1\n".encode("latin-1"))
    df = fcsv.read_csv(spark, p, encoding="ISO-8859-1")
    assert df.collect()[0].name == "café"


def test_column_subset_projection(spark, csv_dir):
    """readTableOpt column subset."""
    p = str(csv_dir / "subset.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1,2,3\n")
    df = fcsv.read_csv(spark, p, columns=["a", "c"])
    assert df.columns == ["a", "c"]


def test_sanitize_names(spark):
    assert fcsv.sanitize_name("Total Price ($)") == "Total_Price"
    assert fcsv.sanitize_name("2024 rev") == "c2024_rev"


def test_colliding_headers_deduped(spark, csv_dir):
    """Distinct headers that sanitize to the same identifier (a!, a?)
    must not produce duplicate column names (reference:
    test/Overlap.hs:8-12 refuses to redefine an identifier; we keep
    both columns, suffixed) — and both stay selectable by name."""
    p = str(csv_dir / "collide.csv")
    with open(p, "w") as f:
        f.write("a!,a?,b\n1,2,x\n3,4,y\n")
    df = fcsv.read_csv(spark, p)
    assert df.columns == ["a", "a_2", "b"]
    rows = {r.b: r for r in df.select("a", "a_2", "b").collect()}
    assert rows["x"].a == 1 and rows["x"].a_2 == 2
    assert rows["y"].a == 3 and rows["y"].a_2 == 4
    # a pre-existing a_2 header is not clobbered by the suffixing
    assert fcsv.dedupe_names(["a", "a", "a_2"]) == ["a", "a_3", "a_2"]
    assert fcsv.dedupe_names(["a", "a", "a"]) == ["a", "a_2", "a_3"]


def test_multiline_quoted_records(spark, csv_dir):
    """RFC-4180 embedded newlines inside quoted fields (reference:
    test/Spec.hs:217 rejects test/data/multiline.csv — we parse it)
    plus a write->read round trip preserving the newlines."""
    p = str(csv_dir / "multiline.csv")
    with open(p, "w") as f:
        f.write(
            "RowNum,Description,X,Y\n"
            '1,"simple",10,10\n'
            '2,"""quoted""",20,20\n'
            '3,"multi\nline\ntext\nfield",30,30\n'
            '4,"simple again",40,40\n'
        )
    df = fcsv.read_csv(spark, p, multi_line=True)
    rows = {r.RowNum: r.Description for r in df.collect()}
    assert rows == {
        1: "simple",
        2: '"quoted"',
        3: "multi\nline\ntext\nfield",
        4: "simple again",
    }
    out = str(csv_dir / "multiline_out")
    fcsv.write_csv(df, out)
    back = fcsv.read_csv(spark, out, multi_line=True)
    assert {r.RowNum: r.Description for r in back.collect()} == rows


# ---------------------------------------------------------------------------
# Custom column types: runtime declareColumn/Parseable (reference:
# src/Frames/TH.hs:91, demo/TutorialUsers.hs teaches the inferencer
# a custom enum column and the typed read applies it).
# ---------------------------------------------------------------------------

_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec"]


def _month_parse(c):
    from pyspark.sql import functions as F

    expr = None
    for i, m in enumerate(_MONTHS):
        cond = F.lower(F.trim(c)) == m
        expr = F.when(cond, i + 1) if expr is None else expr.when(cond, i + 1)
    return expr


MONTH = fcsv.ColumnType(
    name="month",
    predicate=lambda s: s.lower() in _MONTHS,
    spark_type=T.IntegerType(),
    parse=_month_parse,
)


def test_custom_column_type_enum(spark, csv_dir):
    """TutorialUsers-style custom enum: inference recognizes it, the
    typed read maps it JVM-side, unknown cells are Maybe-NULL, and a
    write->read round trip of the parsed values survives."""
    p = str(csv_dir / "months.csv")
    with open(p, "w") as f:
        f.write("id,m\n1,jan\n2,FEB\n3,dec\n")
    schema = fcsv.infer_schema(spark, p, custom_types=[MONTH])
    assert schema["m"].dataType == T.IntegerType()
    assert schema["m"].metadata.get("frames_custom") == "month"
    df = fcsv.read_csv(spark, p, custom_types=[MONTH])
    rows = {r.id: r.m for r in df.collect()}
    assert rows == {1: 1, 2: 2, 3: 12}
    # round trip: the parsed ints are plain ints downstream
    out = str(csv_dir / "months_out")
    fcsv.write_csv(df, out)
    back = fcsv.read_csv(spark, out)
    assert {r.id: r.m for r in back.collect()} == rows


def test_custom_type_falls_back_to_string(spark, csv_dir):
    """One cell outside the custom domain degrades the column to
    string (Frames: a failed Parseable falls back to Text)."""
    p = str(csv_dir / "months_bad.csv")
    with open(p, "w") as f:
        f.write("id,m\n1,jan\n2,notamonth\n")
    schema = fcsv.infer_schema(spark, p, custom_types=[MONTH])
    assert schema["m"].dataType == T.StringType()


def test_custom_type_beats_builtin_lattice(spark, csv_dir):
    """A custom type of digit strings (zip codes) wins over Int, so
    leading zeros survive — custom predicates are tried first."""
    import re

    ZIP = fcsv.ColumnType(
        name="zipcode",
        predicate=lambda s: re.fullmatch(r"\d{5}", s) is not None,
        spark_type=T.StringType(),
    )
    p = str(csv_dir / "zips.csv")
    with open(p, "w") as f:
        f.write("city,zip\nboston,02134\nnyc,10001\n")
    schema = fcsv.infer_schema(spark, p, custom_types=[ZIP])
    assert schema["zip"].dataType == T.StringType()
    df = fcsv.read_csv(spark, p, custom_types=[ZIP])
    assert sorted(r.zip for r in df.collect()) == ["02134", "10001"]


def test_zoned_timestamp_csv(spark, csv_dir):
    """demo/TimeZones/: offset-bearing strings become UTC instants
    under the pinned UTC session zone, and the instant survives a
    parquet round trip (NTZ-vs-LTZ: what we write back out reads as
    the same micros)."""
    from datetime import datetime

    p = str(csv_dir / "zoned.csv")
    with open(p, "w") as f:
        f.write(
            "id,t\n"
            "1,2003-03-30T01:10:00+02:00\n"
            "2,2003-03-30T01:10:00Z\n"
            "3,2003-03-29 20:10:00-05:00\n"
        )
    df = fcsv.read_csv(spark, p, custom_types=[fcsv.ZONED_TIMESTAMP])
    assert dict(df.dtypes)["t"] == "timestamp"
    rows = {r.id: r.t for r in df.collect()}
    # all three are instants; session zone is UTC so naive == UTC
    assert rows[1] == datetime(2003, 3, 29, 23, 10)
    assert rows[2] == datetime(2003, 3, 30, 1, 10)
    assert rows[3] == datetime(2003, 3, 30, 1, 10)
    # parquet round trip preserves the instant regardless of NTZ/LTZ
    out = str(csv_dir / "zoned_parquet")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert {r.id: r.t for r in back.collect()} == rows


def test_zoned_timestamp_jsonl(spark, csv_dir):
    """Same ingest contract for JSONL: opt-in inferTimestamp maps
    offset strings to UTC instants."""
    from datetime import datetime

    from frames_spark.sources import jsonl as fjsonl

    p = str(csv_dir / "zoned.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "t": "2003-03-30T01:10:00+02:00"}\n')
        f.write('{"id": 2, "t": "2003-03-30T01:10:00Z"}\n')
    df = fjsonl.read_jsonl(spark, p, zoned_timestamps=True)
    assert dict(df.dtypes)["t"] == "timestamp"
    rows = {r.id: r.t for r in df.collect()}
    assert rows[1] == datetime(2003, 3, 29, 23, 10)
    assert rows[2] == datetime(2003, 3, 30, 1, 10)
    # without the opt-in, the field stays a plain string
    df2 = fjsonl.read_jsonl(spark, p)
    assert dict(df2.dtypes)["t"] == "string"


def test_gzip_csv_roundtrip(spark, tmp_path):
    """Compressed CSV ingest: gzip shards read transparently through
    the same inference path (crawl dumps arrive compressed; at scale
    the only caveat is that gzip files are unsplittable — one task
    per shard, so shard sizing is the parallelism knob)."""
    import gzip

    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a,b\n1,x\n2,y\n3,z\n")
    df = fcsv.read_csv(spark, str(p))
    assert df.count() == 3
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int",
        "string",
    ] or [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "string",
    ]
    assert {r["a"] for r in df.collect()} == {1, 2, 3}


def test_read_csv_debug_corrupt_column(spark, tmp_path):
    # readTableDebug analog (reference CSV.hs:403): permissive mode
    # surfaces WHICH rows failed via the corrupt-record channel
    p = tmp_path / "dirty.csv"
    p.write_text("a,b\n1,2\nnotanint,3\n4,5\n6\n")
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.LongType(), True),
        ]
    )
    df = fcsv.read_csv(
        spark, str(p), schema=schema, corrupt_column="_corrupt_record"
    ).cache()
    rows = df.collect()
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    good = [(r.a, r.b) for r in rows if r["_corrupt_record"] is None]
    assert sorted(good) == [(1, 2), (4, 5)]
    # both failure shapes captured with their raw lines: bad cell
    # (column inferred long from the prefix) and wrong arity
    assert sorted(bad) == ["6", "notanint,3"]
    df.unpersist()


def test_read_csv_debug_requires_permissive(spark, tmp_path):
    with pytest.raises(ValueError, match="permissive"):
        fcsv.read_csv(
            spark, "x.csv", permissive=False, corrupt_column="_c"
        )


def test_csv_noquoting_roundtrip(spark, tmp_path):
    # Frames NoQuoting (CSV.hs:60): stray quotes survive verbatim and
    # the writer never adds RFC quoting
    df = spark.createDataFrame(
        [(1, 'say "hi" twice'), (2, 'no quotes here')],
        "k long, v string",
    )
    out = tmp_path / "nq"
    fcsv.write_csv(df.coalesce(1), str(out), quoting=False)
    raw = "".join(
        f.read_text()
        for f in out.iterdir()
        if f.name.startswith("part-")
    )
    assert 'say "hi" twice' in raw and '"say' not in raw
    back = fcsv.read_csv(spark, str(out), quoting=False)
    got = {r.k: r.v for r in back.collect()}
    assert got == {1: 'say "hi" twice', 2: "no quotes here"}

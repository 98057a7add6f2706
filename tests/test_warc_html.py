"""WARC/WET source (sources/warc.py) + HTML extraction chain
(functions/html.py): executor-side shard parsing, record filtering,
HTTP header stripping, gzip shards, and the Spark/Python
differential of the html_to_text regexp chain."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from frames_spark.functions.html import (
    HTML_CHAIN,
    html_to_text,
    py_html_to_text,
)
from frames_spark.sources.warc import read_warc


def _record(rtype, uri, payload: bytes, extra=()):
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rtype.encode() + b"-1>",
        b"WARC-Date: 2026-01-01T00:00:00Z",
    ]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.extend(extra)
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTML_BODY = b"<html><body><p>Hello &amp; welcome</p></body></html>"
HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML_BODY
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    shard1 = (
        _record("warcinfo", None, b"software: test\r\n")
        + _record(
            "response",
            "http://example.com/a",
            HTTP_PAYLOAD,
            extra=[b"Content-Type: application/http; msgtype=response"],
        )
        + _record(
            "conversion",
            "http://example.com/a",
            b"Hello & welcome",
            extra=[b"Content-Type: text/plain"],
        )
    )
    (d / "shard-00000.warc").write_bytes(shard1)
    shard2 = _record("response", "http://example.com/b", HTTP_PAYLOAD)
    (d / "shard-00001.warc.gz").write_bytes(gzip.compress(shard2))
    return str(d)


def test_warc_reads_all_records_across_shards(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    rows = {(r.record_type, r.target_uri) for r in df.collect()}
    assert rows == {
        ("warcinfo", None),
        ("response", "http://example.com/a"),
        ("conversion", "http://example.com/a"),
        ("response", "http://example.com/b"),
    }


def test_warc_http_strip_and_record_filter(spark, warc_dir):
    resp = read_warc(spark, warc_dir, record_types="response")
    got = {r.target_uri: bytes(r.payload) for r in resp.collect()}
    assert set(got) == {"http://example.com/a", "http://example.com/b"}
    # HTTP headers stripped -> payload is the HTML entity body only
    assert got["http://example.com/a"] == HTML_BODY
    # gzip shard parsed identically
    assert got["http://example.com/b"] == HTML_BODY
    raw = read_warc(
        spark, warc_dir, record_types="response", http_strip=False
    )
    assert bytes(raw.collect()[0].payload).startswith(b"HTTP/1.1 200")


def test_warc_one_partition_per_shard(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    assert df.rdd.getNumPartitions() == 2


def test_warc_to_text_pipeline(spark, warc_dir):
    docs = (
        read_warc(spark, warc_dir, record_types="response")
        .select(
            F.col("target_uri").alias("doc_id"),
            html_to_text(
                F.decode(F.col("payload"), "utf-8")
            ).alias("text"),
        )
    )
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got["http://example.com/a"] == "Hello & welcome"


HTML_FIXTURES = [
    "<html><head><title>T</title><style>p {color: red}</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><h1>Header</h1><p>First para</p><p>Second</p></body></html>",
    "plain text with no markup at all",
    "a &lt;tag&gt; literal &amp; an &quot;entity&quot; &#39;test&#39;"
    " plus&nbsp;nbsp",
    "<div>nested <span>inline</span> text</div><ul><li>one</li>"
    "<li>two</li></ul>",
    "<!-- a comment --><p>kept</p><!--[if IE]>gone<![endif]-->",
    "<SCRIPT TYPE='x'>upper case\nmulti\nline</SCRIPT>after",
    "line<br>break<hr/>rule",
    "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
    "",
    "   \n\t  ",
]


def test_html_chain_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HTML_FIXTURES)], "i long, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()
    }
    for i, h in enumerate(HTML_FIXTURES):
        assert got[i] == py_html_to_text(h), f"fixture {i}: {h!r}"


def test_html_chain_matches_duckdb_twin(spark):
    import duckdb

    from frames_spark.functions.html import html_to_text_sql

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HTML_FIXTURES)], "i long, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, h in enumerate(HTML_FIXTURES):
        (want,) = con.sql(
            f"SELECT {html_to_text_sql('v')} FROM (SELECT ? AS v)",
            params=[h],
        ).fetchone()
        assert got[i] == want, f"fixture {i}: {h!r}"


def test_html_visible_semantics(spark):
    cases = {
        "<p>a</p><p>b</p>": "a\nb",
        "x<script>y</script>z": "x z",
        "&amp;&lt;&gt;": "&<>",
        "<b>bold</b> and <i>italic</i>": "bold and italic",
    }
    df = spark.createDataFrame(list(cases.items()), "html string, want string")
    for r in df.select(html_to_text(F.col("html")).alias("t"), "want").collect():
        assert r.t == r.want


def test_chain_patterns_are_portable():
    # no backreferences / lookaround (unsupported by RE2 on the
    # oracle side) anywhere in the shared chain
    import re

    for pat, _ in HTML_CHAIN:
        assert "\\1" not in pat and "(?=" not in pat and "(?<" not in pat
        re.compile(pat)  # and every pattern compiles in Python


def test_clean_corpus_strip_html_stage(spark, sf_dir):
    # crawl order: markup-wrapped docs gate identically to their
    # clean-text originals once strip_html extracts the visible text
    from frames_spark.pipelines.pretrain import clean_corpus
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50).cache()
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><script>x=1</script><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("text"),
    )
    plain = {
        (r.doc_id, r.n_tokens)
        for r in clean_corpus(docs.select("doc_id", "text")).collect()
    }
    via_html = {
        (r.doc_id, r.n_tokens)
        for r in clean_corpus(wrapped, strip_html=True).collect()
    }
    assert via_html == plain and len(plain) > 0


def test_write_wet_roundtrip(spark, sf_dir, tmp_path):
    from frames_spark.sources.warc import write_wet
    from frames_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30).cache()
    out = str(tmp_path / "wet")
    write_wet(docs, out, uri_col="doc_id", text_col="text")
    back = read_warc(spark, out, record_types="conversion")
    got = {
        int(r.target_uri): bytes(r.payload).decode("utf-8")
        for r in back.collect()
    }
    want = {r.doc_id: r.text for r in docs.collect()}
    assert got == want
    assert back.select("record_type").distinct().collect()[0][0] == "conversion"


def test_warc_stream_ingests_new_shards_once(spark, tmp_path):
    """Streaming WARC source: shards are picked up as they land,
    each exactly once (file-granular offsets), through the same
    parser as the batch reader."""
    from frames_spark.sources.warc import read_warc_stream

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "shard-0.warc").write_bytes(
        _record("conversion", "http://a", b"alpha text")
    )
    stream = read_warc_stream(spark, str(src), record_types="conversion")
    q = (
        stream.selectExpr("target_uri", "CAST(payload AS STRING) AS text")
        .writeStream.format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r.target_uri, r.text)
            for r in spark.sql("SELECT * FROM warc_stream").collect()
        }
        assert got1 == {("http://a", "alpha text")}
        # a new shard lands: next microbatch reads ONLY the new file
        (src / "shard-1.warc.gz").write_bytes(
            __import__("gzip").compress(
                _record("conversion", "http://b", b"beta text")
            )
        )
        q.processAllAvailable()
        got2 = {
            (r.target_uri, r.text)
            for r in spark.sql("SELECT * FROM warc_stream").collect()
        }
        assert got2 == {("http://a", "alpha text"), ("http://b", "beta text")}
    finally:
        q.stop()


def test_streaming_crawl_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The full crawl front door, streaming: WARC shards -> payload
    decode -> html_to_text -> quality/language gates -> watermarked
    fingerprint dedup — and the survivors equal the batch pipeline
    over the same documents."""
    from frames_spark.pipelines.pretrain import clean_corpus
    from frames_spark.sources.tables import load_table
    from frames_spark.sources.warc import read_warc_stream
    from frames_spark.streaming.corpus import clean_corpus_stream

    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, sf_dir, "documents").limit(40).collect()
    ]
    src = tmp_path / "crawl2"
    src.mkdir()
    for shard in (0, 1):
        blob = b"".join(
            _record(
                "response",
                f"doc://{i}",
                b"HTTP/1.1 200 OK\r\n\r\n<html><body><p>"
                + t.encode()
                + b"</p></body></html>",
            )
            for i, t in docs
            if i % 2 == shard
        )
        (src / f"shard-{shard}.warc").write_bytes(blob)
    stream = read_warc_stream(spark, str(src), record_types="response")
    parsed = stream.select(
        F.regexp_extract("target_uri", r"doc://(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
        F.timestamp_seconds(
            F.regexp_extract("target_uri", r"doc://(\d+)", 1).cast("long")
            + 1_000_000
        ).alias("ingest_ts"),
    )
    cleaned = clean_corpus_stream(parsed, "ingest_ts", strip_html=True)
    q = (
        cleaned.writeStream.format("memory")
        .queryName("crawl_clean")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second pass flushes the watermark past batch-1 rows
        (src / "shard-late.warc").write_bytes(
            _record("response", "doc://999999",
                    b"HTTP/1.1 200 OK\r\n\r\n<html><p>tiny</p></html>")
        )
        q.processAllAvailable()
        got = {
            (r.doc_id, r.n_tokens)
            for r in spark.sql("SELECT * FROM crawl_clean").collect()
        }
    finally:
        q.stop()
    want = {
        (r.doc_id, r.n_tokens)
        for r in clean_corpus(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    # batch clean_corpus additionally drops near-dup pairs, so its
    # survivor set is a subset of the stream's gate+fingerprint set
    assert want <= got and len(want) > 0


def test_warc_stream_compacted_offsets_are_o1(tmp_path):
    # method-level: compacted offsets stay O(1) regardless of file
    # count, ingest each shard exactly once under monotone naming,
    # and skip '.'/'_'-prefixed in-flight files
    from frames_spark.sources.warc import WarcStreamReader

    d = tmp_path / "shards"
    d.mkdir()
    for name in ("s001.warc", "s002.warc", "_inflight.warc", ".tmp.warc"):
        (d / name).write_bytes(b"")
    r = WarcStreamReader({"path": str(d), "compact_offsets": "true"})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    assert o1 == {"upto": str(d / "s002.warc"), "files": []}
    first = {p.path for p in r.partitions(o0, o1)}
    assert first == {str(d / "s001.warc"), str(d / "s002.warc")}
    # a new shard lands atomically with a later name
    (d / "s003.warc").write_bytes(b"")
    o2 = r.latestOffset()
    assert o2 == {"upto": str(d / "s003.warc"), "files": []}
    assert {p.path for p in r.partitions(o1, o2)} == {str(d / "s003.warc")}
    # offset size is constant: one watermark, no per-file entries
    assert len(o2["files"]) == 0
    # migration from a pre-compaction checkpoint: explicit names in
    # start are not replayed even though they sort under the watermark
    legacy = {"files": [str(d / "s001.warc"), str(d / "s002.warc")]}
    assert {p.path for p in r.partitions(legacy, o2)} == {str(d / "s003.warc")}

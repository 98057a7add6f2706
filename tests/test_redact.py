"""PII redaction: each pattern class caught, clean text untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.functions.redact import pii_counts, redact


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t: string")
    row = df.select(
        redact(F.col("t")).alias("red"), *pii_counts(F.col("t"))
    ).first()
    return row


def test_email_redacted(spark):
    r = _one(spark, "write to First.Last+tag@sub.example.co.uk today")
    assert "<EMAIL>" in r.red and "@" not in r.red
    assert r.n_email == 1


def test_phone_and_ip(spark):
    r = _one(spark, "call +1-555-123-4567 or ping 192.168.10.1 now")
    assert "<PHONE>" in r.red and "<IP>" in r.red
    assert r.n_phone == 1 and r.n_ip == 1
    assert "4567" not in r.red and "192.168" not in r.red


def test_clean_text_untouched(spark):
    text = "nothing personal here, just 42 words and version 3.5"
    r = _one(spark, text)
    assert r.red == text
    assert (r.n_email, r.n_phone, r.n_ip) == (0, 0, 0)


def test_multiple_occurrences(spark):
    r = _one(spark, "a@b.io c@d.io e@f.io")
    assert r.n_email == 3 and r.red == "<EMAIL> <EMAIL> <EMAIL>"

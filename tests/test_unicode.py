"""Unicode normalization tier (functions/text.py): NFC/NFKC +
zero-width/control stripping make visually identical text produce
one dedup key; the default normalize() path is unchanged."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from frames_spark.functions.text import (
    fingerprint,
    normalize,
    strip_invisible,
    unicode_normalize,
)

PRE = "caf\u00e9 r\u00e9sum\u00e9"            # precomposed
DEC = "cafe\u0301 re\u0301sume\u0301"          # decomposed
ZW = "caf\u00e9\u200b r\u00e9sum\u00e9\u2060"  # zero-width polluted
NFKC_PAIR = ("\ufb01le \u2460", "file 1")               # ligature + circled digit


def test_nfc_collapses_precomposed_and_decomposed(spark):
    df = spark.createDataFrame([(1, PRE), (2, DEC)], "i long, t string")
    fps = df.select(
        F.md5(normalize(F.col("t"), unicode_form="NFC")).alias("fp")
    ).distinct()
    assert fps.count() == 1
    # without the tier the variants split
    assert df.select(fingerprint(F.col("t"))).distinct().count() == 2


def test_strip_invisible_collides_zero_width_copy(spark):
    df = spark.createDataFrame([(1, PRE), (2, ZW)], "i long, t string")
    fps = df.select(
        F.md5(
            normalize(F.col("t"), unicode_form="NFC", strip_invisibles=True)
        ).alias("fp")
    ).distinct()
    assert fps.count() == 1


def test_nfkc_folds_compatibility_forms(spark):
    a, b = NFKC_PAIR
    df = spark.createDataFrame([(1, a), (2, b)], "i long, t string")
    fps = df.select(
        F.md5(normalize(F.col("t"), unicode_form="NFKC")).alias("fp")
    ).distinct()
    assert fps.count() == 1


def test_unicode_normalize_matches_unicodedata(spark):
    rows = [(i, t) for i, t in enumerate([PRE, DEC, ZW, *NFKC_PAIR, "", "ascii only"])]
    df = spark.createDataFrame(rows, "i long, t string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r.i: r.n
            for r in df.select(
                "i", unicode_normalize(F.col("t"), form).alias("n")
            ).collect()
        }
        for i, t in rows:
            assert got[i] == unicodedata.normalize(form, t), (form, t)


def test_strip_invisible_keeps_real_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a\u200bb\x01c\td\ne")], "i long, t string"
    )
    (r,) = df.select(strip_invisible(F.col("t")).alias("s")).collect()
    assert r.s == "abc\td\ne"


def test_bad_form_raises():
    with pytest.raises(ValueError, match="unknown normalization form"):
        unicode_normalize(F.lit("x"), "NFX")


def test_default_normalize_unchanged(spark):
    # the opt-in tier must not alter the cheap default path existing
    # oracles depend on (no UDF in the plan either)
    df = spark.createDataFrame([(1, "  A   b\tC ")], "i long, t string")
    (r,) = df.select(normalize(F.col("t")).alias("n")).collect()
    assert r.n == "a b c"
    plan = df.select(normalize(F.col("t"))) ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

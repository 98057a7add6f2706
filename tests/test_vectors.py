"""functions/vectors.py: the fixed-point literal helpers."""

from __future__ import annotations


def test_const_int_matrix_equals_nested_lit_form(spark):
    """const_int_matrix (one parsed SQL literal) must produce the
    exact rows the nested F.array/F.lit construction produced —
    including negatives and int64-boundary values."""
    import pyspark.sql.functions as F

    from frames_spark.functions.vectors import const_int_matrix

    rows = [
        [1, -1, 0],
        [2**62, -(2**62), 7],
        [-5, 5, -1048576],
    ]
    lit_form = F.array(
        *[F.array(*[F.lit(int(v)).cast("long") for v in r]) for r in rows]
    )
    got = spark.range(1).select(
        const_int_matrix(rows).alias("a"), lit_form.alias("b")
    ).first()
    assert got["a"] == got["b"]
    assert [list(x) for x in got["a"]] == rows


def test_const_int_matrix_int64_min_renders(spark):
    """INT64_MIN has no positive SQL literal form — the helper must
    emit the (-max - 1) spelling instead of a parse error (r11
    ADVICE)."""
    from frames_spark.functions.vectors import const_int_matrix

    rows = [[-(2**63), 2**63 - 1, 0]]
    got = spark.range(1).select(const_int_matrix(rows).alias("a")).first()
    assert [list(x) for x in got["a"]] == rows


def test_const_int_matrix_rejects_empty_and_overflow():
    """Empty matrices/rows would render untyped array(); out-of-range
    values would silently wrap at the parser. Both raise eagerly."""
    import pytest

    from frames_spark.functions.vectors import const_int_matrix

    with pytest.raises(ValueError, match="empty matrix"):
        const_int_matrix([])
    with pytest.raises(ValueError, match="empty row"):
        const_int_matrix([[1, 2], []])
    with pytest.raises(ValueError, match="outside int64"):
        const_int_matrix([[2**63]])
    with pytest.raises(ValueError, match="outside int64"):
        const_int_matrix([[-(2**63) - 1]])

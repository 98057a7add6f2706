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

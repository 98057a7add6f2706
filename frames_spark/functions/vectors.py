"""Vector (embedding) column functions.

Embeddings arrive as array<float>. All similarity math runs JVM-side
via higher-order functions (transform/zip_with/aggregate) — no Python
UDF per row.

Cross-engine determinism: cosine over floats sums doubles, and
double-sum order is engine-dependent. We therefore quantize each
component to a 2^20 fixed-point BIGINT (floor(x * 2^20 + 0.5) — pure
IEEE ops, identical everywhere); dot products and norms are then
EXACT integer arithmetic, order-independent, and the final cosine is
one deterministic double expression. Precision loss is ~1e-6 per
component — far below any near-dup threshold's noise floor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIXED_POINT = 1 << 20


def const_int_matrix(rows) -> Column:
    """A 2-D BIGINT literal array from driver-side integer rows, as
    ONE parsed SQL expression. Nested F.array/F.lit construction
    costs one py4j round-trip PER LITERAL — a 32x64 plane matrix is
    2048 round-trips, ~4-6 s of driver time per query build
    (measured r11); one expr string is one round-trip and yields the
    identical constant-folded plan literals.

    Input contract: non-empty rows of non-empty int64 values. An
    empty matrix (or an empty row) would render an untyped
    ``array()`` the parser can't type, and INT64_MIN has no positive
    SQL literal (the parser reads ``-9223372036854775808L`` as unary
    minus over an out-of-range positive) — rendered as
    ``(-9223372036854775807L - 1L)`` instead. Values outside int64
    raise rather than silently wrap."""
    rendered_rows = []
    for r in rows:
        vals = [int(v) for v in r]
        if not vals:
            raise ValueError("const_int_matrix: empty row (untyped array())")
        for v in vals:
            if not (-(1 << 63) <= v < (1 << 63)):
                raise ValueError(f"const_int_matrix: {v} outside int64")
        rendered_rows.append(
            "array("
            + ", ".join(
                "(-9223372036854775807L - 1L)" if v == -(1 << 63) else f"{v}L"
                for v in vals
            )
            + ")"
        )
    if not rendered_rows:
        raise ValueError("const_int_matrix: empty matrix (untyped array())")
    return F.expr("array(" + ", ".join(rendered_rows) + ")")


def to_fixed(vec: Column) -> Column:
    """array<float> -> array<bigint> fixed-point at 2^20."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * FIXED_POINT + F.lit(0.5)).cast("long"),
    )


def dot_fixed(a: Column, b: Column) -> Column:
    """Exact integer dot product of two fixed-point vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_fixed(a: Column) -> Column:
    """Exact integer squared norm."""
    return dot_fixed(a, a)


def cosine_from_fixed(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """cos = dot / (sqrt(na2) * sqrt(nb2)) — one deterministic double
    expression over exact integers (na2*nb2 would overflow BIGINT,
    so take the two sqrts separately).

    nullif-guarded: a zero vector has norm 0, and ANSI mode (on by
    default in Spark 4) turns that division into a runtime error
    instead of NaN — cosine vs a zero vector is NULL, which filters
    and rankings treat as no-match."""
    return dot.cast("double") / F.nullif(
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double")),
        F.lit(0.0),
    )

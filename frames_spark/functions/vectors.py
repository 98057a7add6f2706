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
    identical constant-folded plan literals."""
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{int(v)}L" for v in r) + ")"
            for r in rows
        )
        + ")"
    )


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

"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).

Local fingerprint selection: hash every token n-gram, slide a window
of ``w`` consecutive hashes, and keep each window's MINIMUM (ties to
the RIGHTMOST occurrence — the paper's rule). A fingerprint's
identity is the (hash, GLOBAL position) pair: adjacent windows that
select the same occurrence contribute ONE fingerprint, which is what
yields the paper's expected density 2/(w + 1) — encoding a
within-window offset instead silently destroys the dedup and the
density triples (caught by tests/test_winnow.py::test_density_bound).
Guarantee: any shared token run of at least w + n - 1 tokens
produces at least one shared fingerprint HASH in both documents.

Engine-portable determinism: gram hashes are the md5 hash60 reduced
to 40 bits (winnowing tolerates hash collisions by design — MOSS
ships 32–64-bit hashes); the (value, rightmost-tie) minimum is ONE
integer min over ``h40 * 2^20 + (2^20 - 1 - global_pos)`` — min key
= min hash, tie = largest global position. Documents are capped at
2^20 grams (1M tokens) by the position field; chunk longer documents
first (pipelines/chunking.py). Everything is array expressions at
scan stage: no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from frames_spark.functions import text as text_fns
from frames_spark.functions.hashing import hash60

_HASH_MOD = 1 << 40
_POS_BITS = 20
_POS_CAP = (1 << _POS_BITS) - 1


def gram_hashes(text: Column, n: int = 3, seed: str = "win") -> Column:
    """array<long>: seeded 40-bit hashes of the token n-grams.

    The token array is LET-BOUND (r15, functions/binding.py): the
    window lambda captures it, and interpreted HOF eval re-ran the
    tokenize expression once per gram otherwise."""
    from frames_spark.functions.binding import let

    def with_toks(toks: Column) -> Column:
        # guard: sequence(1, len-(n-1)) DESCENDS when len < n
        # (Spark's default step is -1 for start > stop — the gopher
        # token_windows trap), yielding phantom grams; short docs get
        # an empty array
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(grams, lambda g: hash60(g, seed=seed) % _HASH_MOD)

    return let(text_fns.tokens(text), with_toks)


def winnow_keys(text: Column, n: int = 3, w: int = 4, seed: str = "win") -> Column:
    """array<long>: the DISTINCT selected fingerprint keys
    ``h40 * 2^20 + (2^20 - 1 - pos)``; decode hash = key >> 20.
    Documents with fewer than ``w`` grams yield one selection over
    all their grams (the degenerate single window); documents with no
    grams yield an empty array."""
    from frames_spark.functions.binding import let

    def with_hashes(hs: Column) -> Column:
        # hs is a BOUND reference (r15): unbound, every window's
        # lambda re-evaluated the whole gram-hash array — G windows
        # became G² md5 calls, measured 29 s vs 1.5 s at sf0.1 (the
        # winnow_keys_rows docstring's finding, now fixed in the
        # array form too).
        ng = F.size(hs)
        nwin = F.greatest(ng - (w - 1), F.lit(1))
        sel = F.transform(
            F.sequence(F.lit(1), nwin),
            lambda i: F.array_min(
                F.transform(
                    F.slice(hs, i, w),
                    lambda h, off: h * (1 << _POS_BITS)
                    + (F.lit(_POS_CAP) - (i + off)),
                )
            ),
        )
        return F.when(ng > 0, F.array_distinct(sel)).otherwise(
            F.array().cast("array<bigint>")
        )

    return let(gram_hashes(text, n, seed), with_hashes)


def winnow_fingerprints(
    text: Column, n: int = 3, w: int = 4, seed: str = "win"
) -> Column:
    """array<long>: distinct selected gram HASHES (key >> 20) — the
    position-free view cross-document matching joins on."""
    keys = winnow_keys(text, n, w, seed)
    return F.array_distinct(
        F.transform(keys, lambda k: F.shiftright(k, _POS_BITS))
    )


def winnow_keys_rows(
    docs,
    id_col: str,
    text_col: str,
    n: int = 3,
    w: int = 4,
    seed: str = "win",
    with_counts: bool = False,
):
    """(id, key): the selected fingerprint keys as ROWS — the form
    the registered queries use. The array-expression winnow_keys
    re-evaluates the gram-hash array inside every window's lambda
    (higher-order-function arguments are not hoisted), turning G
    windows into G^2 md5 calls — measured 29 s vs 1.5 s at sf0.1.
    Here the grams posexplode once (one md5 per gram), the per-window
    minimum is a SQL sliding frame [CURRENT, w-1 FOLLOWING] over the
    doc partition, and rows beyond the last window start are dropped
    — O(G * w) comparisons, one doc-keyed shuffle, the 100 TB shape."""
    from pyspark.sql import Window

    g = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(gram_hashes(F.col(text_col), n, seed)).alias(
            "pos", "h"
        ),
    )
    keyed = g.select(
        "_id",
        "pos",
        (
            F.col("h") * (1 << _POS_BITS)
            + (F.lit(_POS_CAP) - (F.col("pos") + 1))
        ).alias("k"),
    )
    part = Window.partitionBy("_id").orderBy("pos")
    frame = part.rowsBetween(Window.currentRow, w - 1)
    ng = F.count(F.lit(1)).over(
        Window.partitionBy("_id").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    sel = keyed.select(
        "_id",
        "pos",
        F.min("k").over(frame).alias("key"),
        ng.alias("_ng"),
    ).filter(F.col("pos") <= F.greatest(F.col("_ng") - w, F.lit(0)))
    if with_counts:
        # _ng is constant per doc, so the distinct is unchanged; one
        # explode pass serves both the fingerprints and the gram count
        return sel.select(
            F.col("_id").alias(id_col), "key", F.col("_ng").alias("n_grams")
        ).distinct()
    return sel.select(F.col("_id").alias(id_col), "key").distinct()

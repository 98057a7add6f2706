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
    """array<long>: seeded 40-bit hashes of the token n-grams."""
    toks = text_fns.tokens(text)
    # guard: sequence(1, len-(n-1)) DESCENDS when len < n (Spark's
    # default step is -1 for start > stop — the gopher token_windows
    # trap), yielding phantom grams; short docs get an empty array
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(grams, lambda g: hash60(g, seed=seed) % _HASH_MOD)


def winnow_keys(text: Column, n: int = 3, w: int = 4, seed: str = "win") -> Column:
    """array<long>: the DISTINCT selected fingerprint keys
    ``h40 * 2^20 + (2^20 - 1 - pos)``; decode hash = key >> 20.
    Documents with fewer than ``w`` grams yield one selection over
    all their grams (the degenerate single window); documents with no
    grams yield an empty array."""
    hs = gram_hashes(text, n, seed)
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


def winnow_fingerprints(
    text: Column, n: int = 3, w: int = 4, seed: str = "win"
) -> Column:
    """array<long>: distinct selected gram HASHES (key >> 20) — the
    position-free view cross-document matching joins on."""
    keys = winnow_keys(text, n, w, seed)
    return F.array_distinct(
        F.transform(keys, lambda k: F.shiftright(k, _POS_BITS))
    )

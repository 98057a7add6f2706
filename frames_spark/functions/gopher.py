"""Gopher repetition battery (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1): the standard repetition signals a
pretraining quality gate computes per document —

- duplicate line fraction, duplicate paragraph fraction;
- fraction of characters in the single most frequent {2,3,4}-gram.

Everything here is a PURE SCAN EXPRESSION over the token array: no
explode, no shuffle, embarrassingly parallel at any corpus size.
The most-frequent-n-gram count uses sort_array + a single
aggregate() fold over runs of equal neighbors — O(d log d) per doc
instead of the O(d²) distinct×filter formulation, and the first
maximum in ascending order makes the tie-break the lexically
SMALLEST gram (mirrored in oracles as ORDER BY cnt DESC, gram ASC).

The synthetic corpus carries no newlines, so "lines" are fixed
windows of LINE_WIDTH tokens and "paragraphs" PARA_WIDTH tokens —
the fraction algebra is identical to newline-split text and the
definition is mirrored exactly in the SQL oracle. All fractions are
micros-quantized integers (engine-exact).

Complements q_gopher_quality (length/ratio gates) and q_repetition
(distinct/total ratio); q_boilerplate detects the spans themselves.

Frames ref: no equivalent (LLM-pipeline extension, SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LINE_WIDTH = 8
PARA_WIDTH = 32


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor-division for non-negative longs: (a - a%b)
    is exactly divisible by b, and IEEE division of in-range integers
    with an integral quotient is exact — no Column DIV operator
    exists, and bare ``/`` rounds through double."""
    a = a.cast("long")
    b = b.cast("long")
    return ((a - F.pmod(a, b)) / b).cast("long")


def _round_div_micros(num: Column, den: Column) -> Column:
    """(num * 1e6 + den/2) DIV den as an exact long."""
    num = num.cast("long")
    den = den.cast("long")
    return _idiv(num * 1_000_000 + _idiv(den, F.lit(2)), den)

# Gopher Table A1 removal thresholds (document is DROPPED above).
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
}


def token_windows(toks: Column, width: int) -> Column:
    """Fixed-width token windows (the 'lines'/'paragraphs' of a
    newline-free corpus): ceil(n/width) strings."""
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(0), F.floor((n + width - 1) / width).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
    )


def ngrams(toks: Column, n: int) -> Column:
    """Sliding word n-grams as space-joined strings (empty array for
    docs shorter than n)."""
    size = F.size(toks)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_fraction_micros(arr: Column) -> Column:
    """(len - distinct) / len as a micros-quantized integer (0 for
    empty arrays)."""
    n = F.size(arr)
    dup = n - F.size(F.array_distinct(arr))
    return F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        _round_div_micros(dup, n)
    )


def top_gram(grams: Column) -> Column:
    """struct(cnt, gram) of the most frequent element — one fold over
    the SORTED array counting runs of equal neighbors; ties keep the
    lexically smallest gram (first max in ascending order)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(None).cast("string").alias("gram"),
    )

    def merge(acc: Column, g: Column) -> Column:
        run = F.when(
            acc["prev"].isNotNull() & (g == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1).cast("long"))
        better = run > acc["cnt"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["cnt"]).alias("cnt"),
            F.when(better, g).otherwise(acc["gram"]).alias("gram"),
        )

    return F.aggregate(
        F.sort_array(grams),
        init,
        merge,
        lambda acc: F.struct(acc["cnt"].alias("cnt"), acc["gram"].alias("gram")),
    )


def top_gram_char_frac_micros(
    toks: Column, n: int, total_chars: Column
) -> Column:
    """Characters covered by the most frequent n-gram / total chars,
    micros-quantized (0 when the doc has no n-grams)."""
    top = top_gram(ngrams(toks, n))
    covered = top["cnt"] * F.length(top["gram"]).cast("long")
    return F.when(
        (top["cnt"] <= 0) | (total_chars <= 0), F.lit(0).cast("long")
    ).otherwise(_round_div_micros(covered, total_chars))


def repetition_signals(toks: Column, total_chars: Column) -> dict[str, Column]:
    """The full battery as named micros columns."""
    return {
        "dup_line_frac_micros": dup_fraction_micros(
            token_windows(toks, LINE_WIDTH)
        ),
        "dup_para_frac_micros": dup_fraction_micros(
            token_windows(toks, PARA_WIDTH)
        ),
        "top2_char_frac_micros": top_gram_char_frac_micros(toks, 2, total_chars),
        "top3_char_frac_micros": top_gram_char_frac_micros(toks, 3, total_chars),
        "top4_char_frac_micros": top_gram_char_frac_micros(toks, 4, total_chars),
    }


def passes_repetition_gates(toks: Column, total_chars: Column) -> Column:
    """Boolean: document survives every Gopher repetition threshold
    (micros-integer comparisons — engine-exact)."""
    s = repetition_signals(toks, total_chars)
    t = GOPHER_THRESHOLDS
    return (
        (s["dup_line_frac_micros"] <= int(t["dup_line_frac"] * 1_000_000))
        & (s["dup_para_frac_micros"] <= int(t["dup_para_frac"] * 1_000_000))
        & (s["top2_char_frac_micros"] <= int(t["top2_char_frac"] * 1_000_000))
        & (s["top3_char_frac_micros"] <= int(t["top3_char_frac"] * 1_000_000))
        & (s["top4_char_frac_micros"] <= int(t["top4_char_frac"] * 1_000_000))
    )

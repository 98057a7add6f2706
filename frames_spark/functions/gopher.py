"""Gopher repetition battery (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1): the standard repetition signals a
pretraining quality gate computes per document —

- duplicate line fraction, duplicate paragraph fraction;
- fraction of characters in the single most frequent {2,3,4}-gram;
- fraction of characters in duplicated {5..10}-grams (all
  occurrences of any n-gram appearing more than once; overlapping
  windows may count a character more than once, as in the published
  formulation);
- symbol-to-word ratio (hash and ellipsis symbols per word) and the
  bullet-start / ellipsis-end line fractions from the same table.

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
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
    "symbol_word_ratio": 0.10,
    "bullet_line_frac": 0.90,
    "ellipsis_line_frac": 0.30,
}

# Bullet characters a "line" may start with (Table A1's bullet rule).
BULLET_CHARS = ("•", "‣", "▪", "◦", "-", "*")


def token_windows(toks: Column, width: int) -> Column:
    """Fixed-width token windows (the 'lines'/'paragraphs' of a
    newline-free corpus): ceil(n/width) strings; empty input yields
    ZERO windows (F.sequence(0, -1) would otherwise produce the
    descending [0, -1] and two phantom empty windows)."""
    n = F.size(toks)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(
                F.lit(0), F.floor((n + width - 1) / width).cast("int") - 1
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
        ),
    ).otherwise(F.array().cast("array<string>"))


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


def dup_gram_chars(grams: Column) -> Column:
    """Characters covered by ALL occurrences of grams appearing >= 2
    times: sum over duplicated grams of cnt * length(gram) — the same
    single fold over the sorted array as :func:`top_gram`, banking a
    finished run when the neighbor changes."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def merge(acc: Column, g: Column) -> Column:
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        banked = F.when(
            ~same & (acc["run"] >= 2),
            acc["dup"] + acc["run"] * F.length(acc["prev"]).cast("long"),
        ).otherwise(acc["dup"])
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            banked.alias("dup"),
        )

    return F.aggregate(
        F.sort_array(grams),
        init,
        merge,
        lambda acc: F.when(
            acc["run"] >= 2,
            acc["dup"] + acc["run"] * F.length(acc["prev"]).cast("long"),
        ).otherwise(acc["dup"]),
    )


def dup_gram_char_frac_micros(
    toks: Column, n: int, total_chars: Column
) -> Column:
    """Duplicated-n-gram character fraction, micros-quantized (may
    exceed 1e6 on heavily repeated text — overlapping windows count a
    character once per window, as in the published formulation)."""
    d = dup_gram_chars(ngrams(toks, n))
    return F.when(total_chars <= 0, F.lit(0).cast("long")).otherwise(
        _round_div_micros(d, total_chars)
    )


def symbol_word_ratio_micros(toks: Column) -> Column:
    """(count of '#' chars + '…' chars + non-overlapping '...' runs)
    per word, micros-quantized — Table A1's symbol-to-word rule."""

    def per_tok(t: Column) -> Column:
        hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        uni = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
        dots = _idiv(
            F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))),
            F.lit(3),
        )
        return (hashes + uni + dots).cast("long")

    total = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + per_tok(t),
    )
    n = F.size(toks)
    return F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        _round_div_micros(total, n)
    )


def bullet_line_frac_micros(toks: Column) -> Column:
    """Fraction of 'lines' (LINE_WIDTH-token windows) starting with a
    bullet character, micros-quantized."""
    ws = token_windows(toks, LINE_WIDTH)
    nb = F.size(
        F.filter(ws, lambda w: F.substring(w, 1, 1).isin(*BULLET_CHARS))
    )
    n = F.size(ws)
    return F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        _round_div_micros(nb, n)
    )


def ellipsis_line_frac_micros(toks: Column) -> Column:
    """Fraction of 'lines' ending with an ellipsis ('...' or '…'),
    micros-quantized."""
    ws = token_windows(toks, LINE_WIDTH)
    ne = F.size(
        F.filter(ws, lambda w: w.endswith("...") | w.endswith("…"))
    )
    n = F.size(ws)
    return F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        _round_div_micros(ne, n)
    )


def repetition_signals(
    toks: Column, total_chars: Column, extended: bool = False
) -> dict[str, Column]:
    """The battery as named micros columns. ``extended=True`` adds the
    rest of Table A1: duplicated-{5..10}-gram char fractions, the
    symbol-to-word ratio, and the bullet/ellipsis line fractions.

    The battery is ~10k py4j round-trips to assemble (≈2 s of driver
    time per query build, measured r14) and is a pure function of two
    Column fragments — memoized via exprcache.memo_col."""
    from frames_spark.functions.exprcache import memo_col

    return memo_col(
        "gopher.repetition_signals",
        (toks, total_chars, extended),
        lambda: _repetition_signals(toks, total_chars, extended),
    )


def _repetition_signals(
    toks: Column, total_chars: Column, extended: bool
) -> dict[str, Column]:
    out = {
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
    if extended:
        for n in range(5, 11):
            out[f"dup_{n}gram_char_frac_micros"] = dup_gram_char_frac_micros(
                toks, n, total_chars
            )
        out["symbol_word_ratio_micros"] = symbol_word_ratio_micros(toks)
        out["bullet_line_frac_micros"] = bullet_line_frac_micros(toks)
        out["ellipsis_line_frac_micros"] = ellipsis_line_frac_micros(toks)
    return out


def passes_repetition_gates(toks: Column, total_chars: Column) -> Column:
    """Boolean: document survives every Gopher Table A1 threshold —
    the FULL battery, repetition + symbol/bullet/ellipsis rules
    (micros-integer comparisons — engine-exact)."""
    s = repetition_signals(toks, total_chars, extended=True)
    gate = F.lit(True)
    for key, thr in GOPHER_THRESHOLDS.items():
        gate = gate & (s[f"{key}_micros"] <= int(thr * 1_000_000))
    return gate

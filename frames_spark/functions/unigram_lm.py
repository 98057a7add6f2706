"""Unigram-LM (SentencePiece-style) tokenizer training, Spark-first.

Kudo 2018 ("Subword Regularization", arXiv:1804.10959) trains a
unigram language model over subword pieces: seed a large candidate
vocabulary, alternate E-steps (segment the corpus under the current
piece probabilities) and M-steps (re-estimate probabilities from the
segmentation), pruning low-value pieces until the target vocabulary
size. This is the BPE trainer's sibling (functions/bpe.py) and
follows the same Spark shape:

- the corpus collapses to the WORD-COUNT relation once (one
  map-side-combined shuffle); every EM round touches only that
  vocabulary relation, whose size is corpus-sublinear;
- the E-step is fully distributed: candidate (start, end, piece)
  spans are a scan-stage expression, piece scores arrive by an
  equi-join against the (broadcastable) model relation, and the
  Viterbi DP runs as a pure-JVM ``F.aggregate`` fold over each
  word's scored-span array — bounded by max word length, no Python
  in the loop;
- the M-step state is the MODEL ONLY (<= vocab_size rows) — it
  collects to the driver each round (the BPE "one driver row per
  merge" precedent, here vocab-bounded), where log-probabilities
  are computed with ``math.log`` so the differential pytest against
  the pure-Python reference is exact to the integer micro.

This implementation is the Viterbi-EM variant (hard assignment to
the best segmentation, the common practical simplification) rather
than full forward-backward EM; pruning keeps every single character
with add-one smoothing so segmentation stays total.

Iterative training has no single-query SQL twin, so (per the
engine's convention) the trainer is witnessed by a differential
pytest (tests/test_unigram_lm.py), while the seed vocabulary and the
Viterbi forward pass ARE fully oracled (queries: q_unigram_seed,
q_unigram_viterbi, q_unigram_em1).

Frames ref: no tokenizer surface in Frames (SURVEY.md §2b extension).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from frames_spark.functions.text import tokens

__all__ = [
    "word_counts",
    "seed_pieces",
    "scored_spans",
    "viterbi_best",
    "viterbi_segment",
    "segment_words_inline",
    "em_counts",
    "train_unigram",
    "logp_micros",
]

# Candidate pieces per word position; word length cap bounds the DP
# unroll (and the oracle's unrolled CTE count).
DEFAULT_MAX_PIECE_LEN = 4
DEFAULT_MAX_WORD_LEN = 12


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    word_re: str = "^[a-z]+$",
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> DataFrame:
    """(word, cnt): the bounded-length lowercase word vocabulary."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word").rlike(word_re))
        .filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _span_structs(word: str, max_piece_len: int) -> Column:
    """array<struct<j,i,piece>>: every candidate span of the named
    word column — j = 0-based start, i = 1-based end (piece =
    word[j+1 .. i])."""
    return F.expr(
        "flatten(transform(sequence(1, length({w})), jp1 ->"
        " transform(sequence(jp1, least(length({w}), jp1 + {k} - 1)),"
        " i -> struct(jp1 - 1 AS j, i AS i,"
        " substring({w}, jp1, i - jp1 + 1) AS piece))))".format(
            w=word, k=max_piece_len
        )
    )


def seed_pieces(
    words: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    size: int = 64,
) -> DataFrame:
    """(piece, n): the seed vocabulary — the ``size`` highest-count
    substrings of length <= max_piece_len (count desc, piece asc: one
    total order on both engines) UNION every single character (the
    coverage floor; duplicates collapse). Substring occurrences count
    once per (word, start): a multiset, weighted by word count."""
    spans = words.select(
        F.explode(_span_structs("word", max_piece_len)).alias("s"),
        "cnt",
    ).select(F.col("s.piece").alias("piece"), "cnt")
    counts = spans.groupBy("piece").agg(F.sum("cnt").alias("n"))
    top = counts.orderBy(F.desc("n"), "piece").limit(size)
    chars = counts.filter(F.length("piece") == 1)
    return top.unionByName(chars).distinct()


def scored_spans(
    words: DataFrame,
    model: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """(word, cnt, sp): each word with its array of MODEL-SCORED spans
    struct(i, j, lp, piece), sorted — the shared E-step input. The
    model relation (piece, lp) joins by equi-join and is vocab-bounded
    (broadcastable); spans not in the model vanish here, which is what
    makes the DP skip them."""
    spans = words.select(
        "word",
        "cnt",
        F.explode(_span_structs("word", max_piece_len)).alias("s"),
    ).select("word", "cnt", "s.j", "s.i", "s.piece")
    # LEFT join + null-skipping collect_list: a word with NO model
    # spans must survive with an empty array (its best is null /
    # unreachable), not vanish from the relation
    scored = spans.join(F.broadcast(model), "piece", "left")
    return (
        scored.groupBy("word", "cnt")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("lp").isNotNull(),
                        F.struct("i", "j", "lp", "piece"),
                    )
                )
            ).alias("sp")
        )
    )


def _best_expr(word: Column, sp: Column) -> Column:
    """array<long>: best[p+1] = max total lp of any segmentation of
    the first p characters (null = unreachable; best[1] = 0 for the
    empty prefix). Pure-JVM fold; nulls propagate through + and are
    skipped by greatest, so no sentinel arithmetic (ANSI-safe)."""
    # the init array MUST be cast to array<long> (containsNull=true):
    # concat propagates the init's containsNull=false, the appended
    # NULLs then violate the declared type, and element_at silently
    # reads element 1 for ANY index (Spark 4.1, caught by the
    # unreachable-word test; .show() renders the same array correctly)
    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")).cast("array<long>"),
        lambda acc, i: F.concat(
            acc,
            F.array(
                F.aggregate(
                    F.filter(sp, lambda s: s["i"] == i),
                    F.lit(None).cast("long"),
                    lambda m, s: F.greatest(
                        m, F.element_at(acc, s["j"] + 1) + s["lp"]
                    ),
                )
            ),
        ),
    )


def viterbi_best(
    words: DataFrame,
    model: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """(word, cnt, best): the Viterbi forward pass — the max total
    log-score (model units) of any full segmentation, null when some
    prefix is unreachable under the model."""
    g = scored_spans(words, model, max_piece_len)
    return g.select(
        "word",
        "cnt",
        F.element_at(
            _best_expr(F.col("word"), F.col("sp")), F.length("word") + 1
        ).alias("best"),
    )


def _backtrace_expr(word: Column, sp: Column, best: Column) -> Column:
    """array<string>: the best segmentation's pieces. Backtrace
    tie-break: among spans ending at pos that achieve best[pos], the
    LONGEST piece (smallest j) wins — deterministic on any layout,
    mirrored by the pure-Python reference."""
    step = lambda acc, _i: F.when(  # noqa: E731
        acc["pos"] > F.lit(0),
        F.transform(
            F.array(
                F.array_max(
                    F.transform(
                        F.filter(
                            sp,
                            lambda s: (s["i"] == acc["pos"])
                            & (
                                F.element_at(best, s["j"] + 1) + s["lp"]
                                == F.element_at(best, acc["pos"] + 1)
                            ),
                        ),
                        lambda s: F.struct(
                            (-s["j"]).alias("negj"), s["piece"].alias("piece")
                        ),
                    )
                )
            ),
            lambda c: F.struct(
                (-c["negj"]).alias("pos"),
                F.concat(F.array(c["piece"]), acc["ps"]).alias("ps"),
            ),
        )[0],
    ).otherwise(acc)
    bt = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.struct(
            F.length(word).alias("pos"),
            F.array().cast("array<string>").alias("ps"),
        ),
        step,
        lambda acc: acc["ps"],
    )
    return F.when(F.element_at(best, F.length(word) + 1).isNotNull(), bt)


def viterbi_segment(
    words: DataFrame,
    model: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """(word, cnt, pieces): the best segmentation itself (null when
    the word is unreachable under the model)."""
    g = scored_spans(words, model, max_piece_len).withColumn(
        "best", _best_expr(F.col("word"), F.col("sp"))
    )
    return g.select(
        "word",
        "cnt",
        _backtrace_expr(F.col("word"), F.col("sp"), F.col("best")).alias(
            "pieces"
        ),
    )


def segment_words_inline(
    df: DataFrame,
    word_col: str,
    model: list[tuple[str, int]],
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """df + (pieces): STATELESS expression-only segmentation — the
    model constant-folds into the plan as a literal map (the DSIR
    streaming-scorer pattern), so this works unchanged on a streaming
    DataFrame in append mode: no join, no shuffle, no state. For
    models far beyond ~10^4 pieces use the join-based
    viterbi_segment inside foreachBatch instead — a literal map that
    size stops being a sensible plan constant."""
    mp = F.create_map(
        *[F.lit(v) for p, lp in model for v in (p, int(lp))]
    )
    sp = F.filter(
        F.transform(
            _span_structs(word_col, max_piece_len),
            lambda s: F.struct(
                s["i"].alias("i"),
                s["j"].alias("j"),
                mp[s["piece"]].cast("long").alias("lp"),
                s["piece"].alias("piece"),
            ),
        ),
        lambda s: s["lp"].isNotNull(),
    )
    word = F.col(word_col)
    out = df.withColumn("_sp", sp)
    out = out.withColumn("_best", _best_expr(word, F.col("_sp")))
    return out.withColumn(
        "pieces", _backtrace_expr(word, F.col("_sp"), F.col("_best"))
    ).drop("_sp", "_best")


def em_counts(
    words: DataFrame,
    model: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """(piece, n): hard-EM expected piece counts — each word's Viterbi
    segmentation, weighted by word count. Words unreachable under the
    model (unseen characters) contribute nothing."""
    seg = viterbi_segment(words, model, max_piece_len)
    return (
        seg.filter(F.col("pieces").isNotNull())
        .select(F.explode("pieces").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
    )


def logp_micros(counts: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """(piece, lp): floor(log(n/total)*1e6 + 0.5) — driver-side
    ``math.log`` so the pytest reference compares exactly."""
    total = sum(n for _, n in counts)
    return [
        (p, math.floor(math.log(n / total) * 1_000_000 + 0.5))
        for p, n in counts
    ]


def _smoothed_prune(
    counts: dict[str, int], vocab_size: int
) -> list[tuple[str, int]]:
    """Keep every single character (add-one smoothed, so a character
    absorbed into larger pieces never disappears — segmentation must
    stay total) plus the top multi-char pieces by (count desc, piece
    asc) up to vocab_size."""
    chars = {p: n + 1 for p, n in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    room = max(vocab_size - len(chars), 0)
    kept = dict(multi[:room])
    kept.update(chars)
    return sorted(kept.items())


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    n_rounds: int = 3,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    seed_size: int = 256,
    word_re: str = "^[a-z]+$",
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> list[tuple[str, int]]:
    """Train the unigram LM; returns the final model as a sorted
    [(piece, logp_micros)] list. Driver state is the model only
    (<= max(seed_size, vocab_size) + alphabet rows per round)."""
    spark = docs.sparkSession
    words = word_counts(docs, text_col, word_re, max_word_len).localCheckpoint()
    seed = [(r["piece"], r["n"]) for r in seed_pieces(
        words, max_piece_len, seed_size
    ).collect()]
    model = logp_micros(sorted(seed))
    for _ in range(n_rounds):
        mdf = spark.createDataFrame(model, "piece string, lp long")
        counts = {
            r["piece"]: r["n"]
            for r in em_counts(words, mdf, max_piece_len).collect()
        }
        # characters present in the corpus always survive the prune,
        # even if no Viterbi path used them this round
        for p, _ in model:
            if len(p) == 1:
                counts.setdefault(p, 0)
        model = logp_micros(_smoothed_prune(counts, vocab_size))
    return model

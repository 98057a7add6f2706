"""Unigram-LM trainer: differential test vs a pure-Python reference.

The reference mirrors the Spark pipeline decision-for-decision
(substring multiset seed, Viterbi with integer-micro scores, longest-
piece backtrace tie-break, add-one char smoothing, (count desc, piece
asc) pruning), so equality is EXACT — same pieces, same logp micros.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from frames_spark.functions import unigram_lm as U

# --- pure-Python reference ------------------------------------------------


def ref_word_counts(texts, max_word_len=12):
    words = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w.isalpha() and w.islower() and len(w) <= max_word_len and w:
                words[w] += 1
    return words


def ref_seed(words, k, size):
    subs = Counter()
    for w, c in words.items():
        for j in range(len(w)):
            for L in range(1, min(k, len(w) - j) + 1):
                subs[w[j : j + L]] += c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    seed = dict(top)
    for p, n in subs.items():
        if len(p) == 1:
            seed[p] = n
    return seed


def ref_logp(counts):
    total = sum(counts.values())
    return {
        p: math.floor(math.log(n / total) * 1_000_000 + 0.5)
        for p, n in counts.items()
    }


def ref_viterbi(w, model, k):
    n = len(w)
    best = [None] * (n + 1)
    best[0] = 0
    frm = [None] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - k), i):
            piece = w[j:i]
            if piece in model and best[j] is not None:
                v = best[j] + model[piece]
                # strictly-greater keeps the SMALLEST j on ties
                # (longest piece), matching the Spark backtrace
                if best[i] is None or v > best[i]:
                    best[i] = v
                    frm[i] = j
                elif v == best[i] and j < frm[i]:
                    frm[i] = j
    if best[n] is None:
        return None, None
    pieces = []
    pos = n
    while pos > 0:
        pieces.append(w[frm[pos] : pos])
        pos = frm[pos]
    return best[n], list(reversed(pieces))


def ref_em_counts(words, model, k):
    out = Counter()
    for w, c in words.items():
        _, pieces = ref_viterbi(w, model, k)
        if pieces:
            for p in pieces:
                out[p] += c
    return out


def ref_prune(counts, vocab_size):
    chars = {p: n + 1 for p, n in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    kept = dict(multi[: max(vocab_size - len(chars), 0)])
    kept.update(chars)
    return kept


def ref_train(texts, vocab_size, n_rounds, k, seed_size, max_word_len=12):
    words = ref_word_counts(texts, max_word_len)
    model = ref_logp(ref_seed(words, k, seed_size))
    for _ in range(n_rounds):
        counts = dict(ref_em_counts(words, model, k))
        for p in model:
            if len(p) == 1:
                counts.setdefault(p, 0)
        model = ref_logp(ref_prune(counts, vocab_size))
    return sorted(model.items())


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker they come the quicker they go",
    "lazy dogs dream of quick brown foxes",
    "over and over the foxes jump and jump",
    "a dog and a fox and a quick brown dog",
    "jumping foxes jump over jumping dogs",
]


def _docs(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_seed_matches_reference(spark):
    words = ref_word_counts(TEXTS)
    want = ref_seed(words, 3, 20)
    got = {
        r.piece: r.n
        for r in U.seed_pieces(
            U.word_counts(_docs(spark)), max_piece_len=3, size=20
        ).collect()
    }
    assert got == want


def test_viterbi_matches_reference_costs_and_pieces(spark):
    words = ref_word_counts(TEXTS)
    model = ref_logp(ref_seed(words, 3, 25))
    spark_words = U.word_counts(_docs(spark))
    mdf = spark.createDataFrame(sorted(model.items()), "piece string, lp long")
    got_best = {
        r.word: r.best
        for r in U.viterbi_best(spark_words, mdf, max_piece_len=3).collect()
    }
    got_seg = {
        r.word: r.pieces
        for r in U.viterbi_segment(spark_words, mdf, max_piece_len=3).collect()
    }
    assert set(got_best) == set(words)
    for w in words:
        b, ps = ref_viterbi(w, model, 3)
        assert got_best[w] == b, w
        assert got_seg[w] == ps, w
        assert "".join(ps) == w


def test_em_counts_match_reference(spark):
    words = ref_word_counts(TEXTS)
    model = ref_logp(ref_seed(words, 3, 25))
    mdf = spark.createDataFrame(sorted(model.items()), "piece string, lp long")
    want = dict(ref_em_counts(words, model, 3))
    got = {
        r.piece: r.n
        for r in U.em_counts(
            U.word_counts(_docs(spark)), mdf, max_piece_len=3
        ).collect()
    }
    assert got == want


def test_trained_model_matches_reference_exactly(spark):
    want = ref_train(TEXTS, vocab_size=40, n_rounds=3, k=3, seed_size=60)
    got = U.train_unigram(
        _docs(spark),
        vocab_size=40,
        n_rounds=3,
        max_piece_len=3,
        seed_size=60,
    )
    assert got == want
    # the model is a real subword vocabulary: every char present plus
    # multi-char pieces, probabilities normalized (logs negative)
    pieces = dict(got)
    assert all(lp < 0 for lp in pieces.values())
    assert any(len(p) > 1 for p in pieces)
    alphabet = {c for t in TEXTS for c in t if c.isalpha()}
    assert alphabet <= {p for p in pieces if len(p) == 1}


def test_unreachable_word_yields_null_segmentation(spark):
    # model lacking 'z' cannot segment 'zzz'
    words = spark.createDataFrame([("zzz", 1), ("ab", 2)], "word string, cnt long")
    mdf = spark.createDataFrame(
        [("a", -5), ("b", -7), ("ab", -3)], "piece string, lp long"
    )
    got = {r.word: (r.best, r.pieces) for r in
           U.viterbi_segment(words, mdf).join(
               U.viterbi_best(words, mdf).select("word", "best"), "word"
           ).select("word", "best", "pieces").collect()}
    assert got["zzz"] == (None, None)
    assert got["ab"] == (-3, ["ab"])


def test_inline_segmentation_matches_join_path(spark):
    # the constant-folded-map segmenter (streaming-safe, no shuffle)
    # must agree with the join-based viterbi_segment exactly
    words = ref_word_counts(TEXTS)
    model = sorted(ref_logp(ref_seed(words, 3, 25)).items())
    spark_words = U.word_counts(_docs(spark))
    mdf = spark.createDataFrame(model, "piece string, lp long")
    join_path = {
        r.word: r.pieces
        for r in U.viterbi_segment(spark_words, mdf, max_piece_len=3).collect()
    }
    inline = {
        r.word: r.pieces
        for r in U.segment_words_inline(
            spark_words, "word", model, max_piece_len=3
        ).collect()
    }
    assert inline == join_path


def test_inline_segmentation_streams(spark, tmp_path):
    # stateless append-mode stream == batch on the same rows
    import json

    model = [("a", -3), ("b", -5), ("ab", -2), ("c", -4)]
    rows = ["abc", "ba", "cab"]
    src = tmp_path / "seg_src"
    src.mkdir()
    (src / "w.json").write_text(
        "\n".join(json.dumps({"word": w}) for w in rows)
    )
    stream = (
        spark.readStream.schema("word string").json(str(src))
    )
    seg = U.segment_words_inline(stream, "word", model)
    out = tmp_path / "seg_out"
    chk = tmp_path / "seg_chk"
    q = (
        seg.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.word: r.pieces for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame([(w,) for w in rows], "word string")
    want = {
        r.word: r.pieces
        for r in U.segment_words_inline(batch, "word", model).collect()
    }
    assert got == want
    assert want["abc"] == ["ab", "c"]

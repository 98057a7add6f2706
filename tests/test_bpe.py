"""BPE trainer (functions/bpe.py) vs a pure-Python reference: the
distributed word-count/pair-count/fold-merge loop must learn exactly
the classical algorithm's merges and produce identical encodings."""

from __future__ import annotations

from collections import Counter

from frames_spark.functions.bpe import (
    apply_merges,
    train_bpe,
    word_symbol_counts,
)

CORPUS = [
    (1, "low low low low low lower lower newest newest"),
    (2, "newest newest newest newest widest widest widest"),
    (3, "the newest widest lowest the the"),
]


def _py_bpe(texts: list[str], n_merges: int):
    """Sennrich et al. reference: word counts -> repeated
    most-frequent-pair merges (count desc, pair asc tie-break),
    greedy left-to-right application."""
    words = Counter()
    for t in texts:
        for w in t.split():
            if w.isalpha() and w == w.lower():
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe(docs, n_merges=6)
    want_merges, want_vocab = _py_bpe([t for _, t in CORPUS], 6)
    assert got == want_merges
    enc = {
        r["word"]: list(r["syms"])
        for r in apply_merges(docs, got).collect()
    }
    assert enc == want_vocab


def test_char_split_has_no_empty_symbols(spark):
    docs = spark.createDataFrame([(1, "abc de")], "doc_id long, text string")
    rows = {r["word"]: list(r["syms"]) for r in word_symbol_counts(docs).collect()}
    assert rows == {"abc": ["a", "b", "c"], "de": ["d", "e"]}


def test_train_bpe_stops_when_dry(spark):
    """All-singleton pairs (every pair count 1) stop training early."""
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert train_bpe(docs, n_merges=5) == []


def test_overlapping_merge_is_greedy_left_to_right(spark):
    """'aaaa' with merge (a,a) must become ['aa','aa'], never three
    overlapping merges — the fold's greedy contract."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=1)
    assert merges == [("a", "a")]
    enc = {
        r["word"]: list(r["syms"])
        for r in apply_merges(docs, merges).collect()
    }
    assert enc["aaaa"] == ["aa", "aa"]
    assert enc["aa"] == ["aa"]


def test_train_bpe_history_counts(spark):
    """train_bpe_history returns (round, a, b, n) with n equal to the
    reference pair count at the moment each merge won."""
    from frames_spark.functions.bpe import train_bpe_history

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe_history(docs, n_merges=4)
    # recompute expected counts with the pure-Python reference loop
    want_merges, _ = _py_bpe([t for _, t in CORPUS], 4)
    assert [(a, b) for _, a, b, _ in got] == want_merges
    assert [r for r, *_ in got] == list(range(1, len(got) + 1))
    # counts strictly positive, >= 2 (the stop threshold), and the
    # first round's count is the global max pair frequency
    assert all(n >= 2 for *_, n in got)


def test_train_bpe_random_corpus_differential(spark):
    """Seeded random corpus over a 3-letter alphabet — maximal merge
    ties and same-symbol runs (the greedy fold's hard cases) — must
    match the pure-Python reference through 8 merge rounds."""
    import numpy as np

    rng = np.random.RandomState(0)
    words = [
        "".join(rng.choice(list("abc"), size=rng.randint(1, 9)))
        for _ in range(200)
    ]
    texts = [
        (i, " ".join(words[i * 20 : (i + 1) * 20])) for i in range(10)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = train_bpe(docs, n_merges=8)
    want, want_vocab = _py_bpe([t for _, t in texts], 8)
    assert got == want
    enc = {
        r["word"]: list(r["syms"]) for r in apply_merges(docs, got).collect()
    }
    assert enc == want_vocab

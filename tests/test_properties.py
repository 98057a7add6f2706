"""Property-based differential tests (hypothesis): the distributed
formulations against tiny pure-Python references on adversarial
random inputs — small alphabets force the collisions, overlaps and
boundary shapes example tests rarely cover."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from frames_spark.sources.csv import dedupe_names, sanitize_name

# --- dedupe_names ---------------------------------------------------------

names_strategy = st.lists(
    st.sampled_from(["a", "a_2", "b", "a!", "b?", "col", "2x"]), max_size=8
)


@given(names_strategy)
@settings(max_examples=200, deadline=None)
def test_dedupe_names_properties(raw):
    names = [sanitize_name(n) for n in raw]
    out = dedupe_names(names)
    # same arity, all unique
    assert len(out) == len(names)
    assert len(set(out)) == len(out)
    # first occurrence of each name is preserved verbatim
    seen = set()
    for orig, new in zip(names, out):
        if orig not in seen:
            assert new == orig
            seen.add(orig)
    # already-unique input passes through untouched (idempotence)
    assert dedupe_names(out) == out


# --- substring excision ---------------------------------------------------


def _py_excise(docs: list[tuple[int, list[str]]], n: int, min_count: int = 2):
    """Reference ExactSubstr-at-n semantics: every non-(global-first)
    occurrence of a repeated n-gram has its token interval removed."""
    by = defaultdict(list)
    for did, toks in docs:
        for p in range(len(toks) - n + 1):
            by[tuple(toks[p : p + n])].append((did, p))
    covered: dict[int, set[int]] = defaultdict(set)
    for occs in by.values():
        if len(occs) >= min_count:
            first = min(occs)
            for did, p in occs:
                if (did, p) != first:
                    covered[did].update(range(p, p + n))
    out = {}
    for did, toks in docs:
        kept = [t for i, t in enumerate(toks) if i not in covered[did]]
        out[did] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


corpus_strategy = st.lists(
    st.lists(st.sampled_from(["x", "y"]), max_size=9),
    min_size=1,
    max_size=5,
)


@given(corpus_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_excise_matches_python_reference(spark, token_lists):
    from frames_spark.dedup.substring import excise_repeated_ngrams

    docs = [(i + 1, toks) for i, toks in enumerate(token_lists)]
    rows = [(did, " ".join(toks)) for did, toks in docs]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in excise_repeated_ngrams(sdf, "doc_id", "text", n=3).collect()
    }
    want = _py_excise(docs, n=3)
    assert got == want


# --- two-phase ranking ----------------------------------------------------

frame_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),       # group (few values)
        st.integers(min_value=0, max_value=3),  # order key (heavy ties)
    ),
    min_size=1,
    max_size=30,
)


@given(frame_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_grouped_rank_and_prefix_sum_match_window_reference(spark, rows):
    """grouped_rank / grouped_prefix_sum == the naive window forms on
    random heavily-tied inputs (ties broken by the unique id, as the
    strict-total-order contract requires)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frames_spark.operators.ranking import grouped_prefix_sum, grouped_rank

    data = [(i, g, k) for i, (g, k) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, k long")
    got_rank = {
        r["id"]: (r["rn"], r["cnt"])
        for r in grouped_rank(
            df, ["g"], ["k", "id"], num_partitions=4,
            rank_col="rn", count_col="cnt",
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k", "id")
    wc = Window.partitionBy("g")
    want_rank = {
        r["id"]: (r["rn"], r["cnt"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wc).alias("cnt"),
        ).collect()
    }
    assert got_rank == want_rank

    got_cum = {
        r["id"]: (r["cum"], r["tot"])
        for r in grouped_prefix_sum(
            df, ["g"], ["k", "id"], "k", num_partitions=4,
            cum_col="cum", total_col="tot",
        ).collect()
    }
    want_cum = {
        r["id"]: (r["cum"], r["tot"])
        for r in df.select(
            "id",
            F.sum("k").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
            F.sum("k").over(wc).alias("tot"),
        ).collect()
    }
    assert got_cum == want_cum

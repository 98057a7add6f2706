"""N-gram Jaccard near-duplicate pairs via a shingle inverted index.

Never O(n^2): candidate pairs come from an equi-join on the exploded
(shingle -> doc) inverted index, so only documents sharing at least
one shingle ever meet, and the shuffle is keyed by shingle hash.

Scale controls:
- ``max_df`` drops stop-shingles (present in more than max_df docs)
  before pair generation — the classic guard against the quadratic
  blowup on boilerplate shingles. One shingle shared by D documents
  otherwise becomes a single O(D)-element posting-list row and D²/2
  expanded pairs. Defaults to ``"auto"`` — the rate-based
  ``suggest_max_df`` governor, resolved LAZILY as a broadcast one-row
  count aggregate inside the dedup plan itself (r14; constructors
  stay action-free) — because a FIXED cap is an inverse guard failure
  as the corpus grows: at ~10x the bench corpus df<=64 stopped EVERY
  shingle and near-dup recall silently went to zero (the r12 sf1
  find).
  Registered oracle queries pass explicit pins (their SQL twins
  mirror the guard exactly — a HAVING df <= max_df CTE); pass
  ``max_df=None`` only for formulation-equivalence tests.
- Jaccard is exact: |A ∩ B| from the index join, |A|,|B| from
  per-doc shingle counts; integer-ratio division is deterministic
  across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.hashing import shingles
from frames_spark.functions.text import tokens
from frames_spark.operators.core import spread

# Default stop-shingle guard: shingles present in more documents than
# this are dropped before pair generation, bounding every posting list
# (and so the pair fan-out) by a constant. 64 keeps content shingles
# (near-dup pairs share rare shingles) while cutting boilerplate.
DEFAULT_MAX_DF = 64

# Default boilerplate RATE for the governed cap: a shingle present in
# more than this many docs per million (1%) is boilerplate at any
# corpus size. A module constant so oracle SQL twins can interpolate
# the SAME value suggest_max_df defaults to (they cannot desync).
DEFAULT_MAX_DF_RATE_PPM = 10_000

# Candidate-mass budget for the posting-list guard (r14 sf10 find):
# the df cap bounds EVERY posting list, but NOT the total pair mass
# sum(df*(df-1)/2) — when the shingle space SATURATES (a bounded
# vocabulary over a growing corpus), every df compresses BELOW the 1%
# rate cap and the cap filters nothing: measured at 10x the certified
# density, all 29,791 possible vocab shingles sat at df 65-2006 under
# a cap of 10,000 and the candidate set reached 46.2e9 pairs — a
# cluster-melting shuffle constructed silently. Pairs-per-doc is the
# density rate that catches it: ~460 at sf0.1, ~4.6k at sf1 (both
# certified green), ~46k at sf10 (measured intractable). The default
# budget separates those regimes; past it the honest answers are the
# MinHash-LSH banded tier (candidates bounded by band width, not df)
# or an explicit higher budget.
DEFAULT_MAX_PAIRS_PER_DOC = 10_000


def suggest_max_df(
    n_docs: int, rate_ppm: int = DEFAULT_MAX_DF_RATE_PPM,
    floor: int = DEFAULT_MAX_DF,
) -> int:
    """Parameter governor for the stop-shingle cap — the jaccard
    analog of embedding.suggest_num_planes. A FIXED df cap is an
    inverse guard failure as the corpus grows: every content
    shingle's document frequency scales with corpus size, so at some
    scale the cap stops ALL shingles and dedup silently returns zero
    pairs (measured: the r12 sf1 sweep — the pinned df<=64 drops
    q_dedup_ngram's pair set to empty at 10x the bench corpus).
    Boilerplate is a RATE, not a count: a shingle present in more
    than ``rate_ppm`` of documents (default 1%) is boilerplate at any
    corpus size; ``floor`` keeps small corpora on the proven fixed
    cap. Callers derive n_docs from a one-aggregate pre-flight via
    ``max_df="auto"``; pinned registered queries keep explicit
    values.

    n_docs semantics per entry point (r13 ADVICE): the corpus-level
    constructors (jaccard_pairs, containment_pairs, ...) count corpus
    ROWS — the registered *_auto oracles mirror exactly that
    (``COUNT(*) FROM corpus``). The pre-built-index entry point
    (containment_pairs_from_index) has no corpus relation in scope
    and counts the index's DISTINCT shingled docs instead — a lower
    bound on corpus rows (docs shorter than n tokens contribute no
    shingles), so its derived cap can sit at or slightly below the
    corpus-level one. Both are valid governors (the cap needs the
    right ORDER, not an exact census); callers needing bit-identical
    caps across both paths should resolve the int once and pass it
    explicitly, as containment_pairs itself does."""
    return max(floor, n_docs * rate_ppm // 1_000_000)


def _auto_cap_df(
    counted: DataFrame,
    rate_ppm: int = DEFAULT_MAX_DF_RATE_PPM,
    floor: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """One-row ``(max_df BIGINT)`` relation: :func:`suggest_max_df`
    replayed as a Spark aggregate over ``counted``'s row count — the
    LAZY form of the ``"auto"`` governor (r13 ADVICE: plan
    construction stays action-free; the cap folds into the same job
    as the dedup plan via a broadcast one-row join instead of an
    eager ``count()`` pre-flight). Integer arithmetic mirrors
    suggest_max_df exactly: GREATEST of the floor and
    ``count * rate_ppm div 1e6`` (bigint integer division), so the
    lazy and eager caps are equal for every corpus size and the
    registered *_auto oracles' gov CTEs stay value-identical."""
    return counted.agg(
        F.expr(
            f"greatest(CAST({floor} AS BIGINT),"
            f" count(1) * {rate_ppm} div 1000000) AS max_df"
        )
    )


def _resolve_max_df(df: DataFrame, max_df) -> int | None | DataFrame:
    """``"auto"`` -> the lazy one-row cap relation over the corpus
    row count (no job at construction time); ints and None pass
    through."""
    if max_df == "auto":
        return _auto_cap_df(df)
    return max_df


def _resolve_max_df_index(index: DataFrame, max_df) -> int | None | DataFrame:
    """`_resolve_max_df` for the pre-built (doc, shingle) index entry
    point: n_docs is the distinct doc count (the index has no corpus
    relation to count rows of — a lower bound on corpus rows, see
    suggest_max_df's docstring)."""
    if max_df == "auto":
        return _auto_cap_df(index.select("doc").distinct())
    return max_df


def _guard_candidate_mass(
    index: DataFrame,
    max_df: int | None | DataFrame,
    guard: str,
    max_pairs_per_doc: int,
) -> None:
    """Eager candidate-mass guard for the posting-list tier (the
    jaccard analog of near_dup_pairs_lsh's bucket guard — the r11
    'miners' eager posture', triggered by the r14 sf10 find): ONE
    light id-only action computes the pair mass the in-array i<j
    expansion would generate under the (possibly lazy) df cap,
    sum(df*(df-1)/2) over kept shingles, plus the distinct doc count,
    and warns/raises when mass exceeds ``max_pairs_per_doc * docs``.
    A saturated shingle space (bounded vocabulary, growing corpus)
    slides EVERY df under the rate cap, so the cap alone stops
    bounding total work — this is the backstop. ``guard="off"``
    skips the action entirely (registered oracle queries do, keeping
    construction action-free; their standing audit is the sweep)."""
    if guard not in ("raise", "warn", "off"):
        raise ValueError(f"guard must be raise|warn|off, got {guard!r}")
    if guard == "off":
        return
    counts = index.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if isinstance(max_df, DataFrame):
        counts = counts.crossJoin(F.broadcast(max_df))
        kept = F.col("df") <= F.col("max_df")
    elif max_df is None:
        kept = F.lit(True)
    else:
        kept = F.col("df") <= max_df
    mass_df = counts.agg(
        F.sum(
            F.when(kept, F.col("df") * (F.col("df") - 1) / 2).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("cand")
    ).crossJoin(
        index.select("doc").distinct().agg(
            F.count(F.lit(1)).alias("docs")
        )
    )
    row = mass_df.first()
    cand, docs = row["cand"] or 0, row["docs"] or 0
    if docs and cand > max_pairs_per_doc * docs:
        msg = (
            f"posting-list candidate mass {cand} is "
            f"{cand // docs} pairs/doc over {docs} docs (budget "
            f"{max_pairs_per_doc}/doc) — the shingle space is "
            "saturated and the df cap no longer bounds total work; "
            "use the MinHash-LSH banded tier (dedup.minhash) or pass "
            "a higher max_pairs_per_doc explicitly"
        )
        if guard == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


def shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) inverted index over distinct word n-grams."""
    df = spread(df)  # shingling is CPU-bound; never run it on 1 partition
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("shingle"),
    )


def rare_shingles(
    index: DataFrame, max_df: int | None | DataFrame
) -> DataFrame:
    """Drop stop-shingles (document frequency > max_df) from the index.

    This is the linear LeftSemi guard every posting-list tier routes
    through; ``max_df=None`` disables it (formulation tests only).
    ``max_df`` may also be a one-row ``(max_df)`` relation (the lazy
    "auto" governor from :func:`_auto_cap_df`): it joins in broadcast
    so the derived cap is computed inside the same job as the dedup
    plan, never as a separate pre-flight action."""
    if max_df is None:
        return index
    counts = index.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if isinstance(max_df, DataFrame):
        rare = (
            counts.crossJoin(F.broadcast(max_df))
            .filter(F.col("df") <= F.col("max_df"))
            .select("shingle")
        )
    else:
        rare = counts.filter(F.col("df") <= max_df).select("shingle")
    return index.join(rare, "shingle", "left_semi")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int | None | str = "auto",
    guard: str = "warn",
    max_pairs_per_doc: int = DEFAULT_MAX_PAIRS_PER_DOC,
) -> DataFrame:
    """ORDERED pairs (doc_a, doc_b, n_common, n_shingles_a,
    containment = |A∩B| / |A|) over every document pair sharing at
    least one (non-stop) shingle — the asymmetric companion to
    :func:`jaccard_pairs` (a quoted excerpt scores high even when
    the host document is large).

    Scale shape: the shingle-explode lineage runs ONCE, candidate
    generation is the posting-list groupBy + in-array i<j expansion
    (never a two-sided index self-join — a boilerplate shingle shared
    by D docs would expand to D² join rows), and the ordered mirror
    (b,a) is produced AFTER the pair aggregation by a row-local
    2-element explode, so the pair shuffle carries each unordered
    pair once. ``max_df`` is the stop-shingle guard bounding every
    posting list; defaults to ``"auto"`` (suggest_max_df as a lazy
    broadcast count aggregate — boilerplate is a RATE, and the fixed
    cap silently empties the pair set at ~10x the bench corpus, the
    r12 sf1 find). Registered oracle queries pass explicit pins.
    """
    return containment_pairs_from_index(
        shingle_index(df, id_col, text_col, n),
        max_df=_resolve_max_df(df, max_df),
        guard=guard,
        max_pairs_per_doc=max_pairs_per_doc,
    )


def containment_pairs_from_index(
    index: DataFrame,
    max_df: int | None | str = "auto",
    guard: str = "warn",
    max_pairs_per_doc: int = DEFAULT_MAX_PAIRS_PER_DOC,
) -> DataFrame:
    """:func:`containment_pairs` over a pre-built (doc, shingle)
    inverted index — lets one index relation feed several dedup
    tiers (see q_dedup_summary, which persists the index once).
    ``max_df="auto"`` (default) derives the cap from the index's
    distinct doc count, lazily (a broadcast one-row aggregate in the
    same job — no pre-flight action); persist the index first if the
    lineage is expensive (the q_dedup_summary pattern), since the cap
    subtree otherwise re-evaluates that lineage inside the job.
    ``guard`` (off|warn|raise, default warn — the r11 eager-guard
    posture) runs one light id-only action bounding the TOTAL
    candidate mass the expansion would generate; see
    :func:`_guard_candidate_mass` and the r14 sf10 saturation find."""
    resolved = _resolve_max_df_index(index, max_df)
    _guard_candidate_mass(index, resolved, guard, max_pairs_per_doc)
    index = rare_shingles(index, resolved)
    sizes = index.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    postings = (
        index.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        postings.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sym = inter.join(
        sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("sa")),
        "doc_a",
    ).join(
        sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("sb")),
        "doc_b",
    )
    both = sym.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a"),
                    F.col("doc_b"),
                    F.col("n_common"),
                    F.col("sa").alias("n_shingles_a"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"),
                    F.col("n_common"),
                    F.col("sb").alias("n_shingles_a"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return both.withColumn(
        "containment",
        F.col("n_common").cast("double") / F.col("n_shingles_a").cast("double"),
    )


def jaccard_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int | None | str = "auto",
    guard: str = "warn",
    max_pairs_per_doc: int = DEFAULT_MAX_PAIRS_PER_DOC,
) -> DataFrame:
    """The raw pair relation every Jaccard consumer derives from:
    (doc_a < doc_b, n_common, size_a, size_b) for every pair sharing
    at least one (non-stop) shingle. ``jaccard_pairs`` thresholds it;
    the dedup-curve query sweeps every threshold over ONE instance.

    posting-list groupBy + in-array pair expansion: the index
    lineage (shingle explode) runs ONCE and shuffles once, vs twice
    each for the self-join form. Posting lists are bounded by the
    max_df guard (and naturally for content shingles)."""
    raw = shingle_index(df, id_col, text_col, n)
    resolved = _resolve_max_df(df, max_df)
    _guard_candidate_mass(raw, resolved, guard, max_pairs_per_doc)
    index = rare_shingles(raw, resolved)
    sizes = index.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    postings = (
        index.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) ->"
        " transform(slice(ds, i + 2, size(ds)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        postings.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None | str = "auto",
    guard: str = "warn",
    max_pairs_per_doc: int = DEFAULT_MAX_PAIRS_PER_DOC,
) -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with jaccard >= threshold."""
    return (
        jaccard_pair_counts(
            df, id_col, text_col, n, max_df, guard, max_pairs_per_doc
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )

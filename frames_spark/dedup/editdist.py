"""Edit-distance-1 string pairs via deletion neighborhoods.

Two strings are within Levenshtein distance 1 iff they share a
member of their deletion neighborhoods (the string itself plus every
single-character deletion) of compatible lengths — the SymSpell
trick. That turns a quadratic fuzzy join into: explode ~|s|+1
variants per string, ONE groupBy on the variant, and in-bucket i<j
pair expansion (same shape as the LSH band buckets in minhash.py —
the self-join formulation would run the variant lineage twice).
A final `levenshtein() <= 1` filter removes the false positives the
neighborhood admits (two deletions landing on the same variant).

At 100 TB: shuffle volume is O(total chars), bucket keys are the
variants themselves (high cardinality, low skew for natural text);
`max_bucket` guards against degenerate hub variants from very short
strings — bound candidate strings to len >= min_len for the same
reason.

Frames ref: no fuzzy matching in Frames; scale extension surface
(SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column) -> Column:
    """array: the string plus every single-character deletion."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    return F.array_union(F.array(s), deletions)


def edit1_pairs(
    df: DataFrame,
    col: str,
    min_len: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Distinct (a, b) with a < b and levenshtein(a, b) <= 1, from
    the distinct values of ``col`` with length >= min_len."""
    vocab = (
        df.select(F.col(col).alias("s"))
        .filter(F.length("s") >= min_len)
        .distinct()
    )
    exploded = vocab.select(
        "s", F.explode(deletion_variants(F.col("s"))).alias("variant")
    )
    buckets = (
        exploded.groupBy("variant")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ss") <= max_bucket)
    pairs = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .distinct()
        .filter(F.levenshtein("a", "b") <= 1)
    )


def deletion_neighborhood(s: Column, k: int) -> Column:
    """array: every string obtainable from ``s`` by deleting UP TO k
    characters (the SymSpell neighborhood generalized to k). If
    lev(a, b) <= k then a and b share a member: delete each side's
    unmatched characters of an optimal alignment (<= k per side) and
    both reach the same string — so bucketing on the neighborhood is
    recall-lossless for any k. Size is O(len^k / k!): only usable for
    SHORT strings; that is exactly the regime where the q-gram count
    bound fails (see qgram_edit_pairs)."""
    out = F.array(s)
    frontier = F.array(s)
    for _ in range(k):
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, deletion_variants))
        )
        out = F.array_union(out, frontier)
    return out


def _short_pairs(
    vocab: DataFrame, k: int, max_bucket: int | None
) -> DataFrame:
    """Exact lev<=k pairs among a SHORT-string vocabulary (s column)
    via k-deletion neighborhoods: explode variants, one groupBy on the
    variant, in-array i<j expansion, levenshtein verify."""
    exploded = vocab.select(
        "s", F.explode(deletion_neighborhood(F.col("s"), k)).alias("variant")
    )
    buckets = (
        exploded.groupBy("variant")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ss") <= max_bucket)
    expand = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.select(F.explode(expand).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.abs(F.length("a") - F.length("b")) <= k)
        .distinct()
    )


def qgram_multiset(s: Column, q: int = 3) -> Column:
    """Positional q-gram multiset of ``s`` as an array (may repeat)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s) - (q - 1)),
        lambda i: s.substr(i, F.lit(q)),
    )


def qgram_edit_pairs(
    df: DataFrame,
    col: str,
    k: int = 2,
    q: int = 3,
    max_bucket: int | None = 10_000,
    short_strings: str = "exact",
) -> DataFrame:
    """Distinct (a, b, lev) with a < b and levenshtein(a, b) <= k —
    the prefix-filtered q-gram similarity join (Gravano et al.
    VLDB'01 count bound; Chaudhuri, Ganti & Kaushik ICDE'06 prefix
    filter).

    Candidate generation: each string's q-gram MULTISET entries
    (gram, occurrence#) are ranked by global rarity (document
    frequency, ties by gram then occurrence — one total order on both
    engines) and only the k*q+1 RAREST form its prefix. Two strings
    within edit distance k share >= |G(s)| - k*q multiset q-grams
    (count bound), so they MUST collide on a prefix entry — PROVIDED
    |G(s)| > k*q, i.e. len(s) >= q*(k+1). Below that the bound
    guarantees nothing (k=2, q=3: 'abcd' vs 'efcd' are lev 2 with
    ZERO shared q-grams), so strings shorter than q*(k+1)+k — the
    longest possible partner of an unguaranteed string — route
    through an exact k-deletion-neighborhood fallback
    (``short_strings="exact"``, the default; ``"drop"`` restores the
    prefix-only candidate set and silently loses short pairs). With
    the fallback the candidate set is exact for EVERY length; only
    prefix entries enter the main posting lists: 7 entries/string at
    the defaults, with bucket sizes bounded by gram rarity rather
    than corpus size.
    Pairs expand in-array i<j per bucket (the LSH-band shape), then
    the exact levenshtein verify drops false positives. ``max_bucket``
    guards adversarial low-entropy corpora where even rarity-ranked
    prefixes collapse onto one gram — ON by default (the stop-shingle
    lesson: a guard that exists one parameter away still OOMs the run
    that forgot it) and mirrored in the registered oracles.

    At 100 TB: shuffle volume is O(7 * |vocab|) posting entries plus
    the rarity-join on the (gram, occ) vocabulary relation; never a
    corpus x corpus product. Edit-distance-1 workloads should prefer
    edit1_pairs (deletion neighborhoods need no df pass)."""
    from pyspark.sql import Window

    if short_strings not in ("exact", "drop"):
        raise ValueError(f"short_strings must be 'exact' or 'drop': {short_strings!r}")
    all_vocab = df.select(F.col(col).alias("s")).distinct()
    vocab = all_vocab.filter(F.length("s") >= q)
    gc = (
        vocab.select("s", F.explode(qgram_multiset(F.col("s"), q)).alias("gram"))
        .groupBy("s", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    occ = gc.select(
        "s", "gram", F.explode(F.sequence(F.lit(1), F.col("c"))).alias("o")
    )
    dfreq = occ.groupBy("gram", "o").agg(F.count(F.lit(1)).alias("dfr"))
    w = Window.partitionBy("s").orderBy("dfr", "gram", "o")
    prefix = (
        occ.join(dfreq, ["gram", "o"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k * q + 1)
    )
    buckets = (
        prefix.groupBy("gram", "o")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ss") <= max_bucket)
    expand = F.expr(
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> struct(x AS a, y AS b))))"
    )
    cand = (
        buckets.select(F.explode(expand).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        # length precondition BEFORE the distinct: cheap map-side cut
        # of the cross-bucket duplicate volume entering the exchange
        .filter(F.abs(F.length("a") - F.length("b")) <= k)
        .distinct()
    )
    if short_strings == "exact":
        # pairs where BOTH sides are shorter than q*(k+1)+k (any pair
        # with one side under q*(k+1) has its partner under this by
        # the length-diff bound) come from the exact neighborhood
        # fallback; the overlap zone is double-covered and distinct'd
        short = all_vocab.filter(F.length("s") < q * (k + 1) + k)
        cand = cand.unionByName(_short_pairs(short, k, max_bucket)).distinct()
    return cand.withColumn("lev", F.levenshtein("a", "b").cast("long")).filter(
        F.col("lev") <= k
    )

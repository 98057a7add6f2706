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

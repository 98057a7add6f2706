"""Text-analysis column functions (all JVM-side `F.*` expressions —
no Python UDFs in these hot paths).

These are the scale extensions of SURVEY.md §2b: quality scoring,
token counting, language-ID scoring, fingerprinting. Every function
is expressible in portable SQL so the DuckDB oracle can replicate it
exactly (the queries in frames_spark/queries.py carry the SQL twins).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists (public common stopwords).
# Real deployments would swap in larger lists or a fastText-style
# model via a Pandas UDF; the scoring pipeline stays identical.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "la", "les", "et", "un"],
    "es": ["el", "la", "los", "y", "una"],
    "zh": ["de", "le", "shi", "he", "zai"],
}

TOKEN_REGEX = r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def normalize(text: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprinting and dedup shingling."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize(text), " ")


def regex_tokens(text: Column) -> Column:
    """BPE-ish token classes: letter runs, digit runs, single
    punctuation — the standard cheap token-count estimator."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    stripped = F.regexp_replace(F.lower(text), r"[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 (not xxhash64) so the fingerprint is identical across engines
    and stable across releases. SURVEY.md §4."""
    return F.md5(normalize(text))

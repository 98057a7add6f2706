"""PII redaction for training corpora.

Email/phone/IP scrubbing as pure ``regexp_replace`` chains — one
fused scan expression per document, no Python in the path. Patterns
deliberately use the regex subset common to Java (Spark) and RE2
(DuckDB oracle): no backreferences, no lookaround — which is also
the subset that stays linear-time on adversarial inputs, a real
concern when the input is a crawl.

Recall here is the pattern's recall (syntactic PII); entity-level
scrubbing (names, addresses) needs an NER pass — that is a Pandas
UDF + model deployment, out of scope for the expression layer.

Frames ref: none; scale extension surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: applied first to last; IP before phone so dotted quads
# don't half-match the phone digits pattern
PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]?\d{0,4}\b", "<PHONE>"),
]


def redact(col: Column) -> Column:
    """All patterns replaced by their placeholder tags, in order."""
    out = col
    for _, pat, tag in PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col: Column) -> list[Column]:
    """One count column per pattern: size(regexp_extract_all(...)) —
    portable (Spark and DuckDB both lack/diverge on regexp_count)."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long").alias(
            f"n_{name}"
        )
        for name, pat, _ in PATTERNS
    ]


def redact_sql(expr: str) -> str:
    """DuckDB twin of redact() — same patterns, same order."""
    out = expr
    for _, pat, tag in PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def pii_counts_sql(expr: str) -> list[str]:
    return [
        f"len(regexp_extract_all({expr}, '{pat}')) AS n_{name}"
        for name, pat, _ in PATTERNS
    ]

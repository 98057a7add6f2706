"""HTML → clean text extraction as a JVM regexp chain.

The first stage of every crawl pipeline: WARC ``response`` payloads
are markup, and quality gates / dedup keys must run on the visible
text. This is a deterministic, engine-portable extraction — a fixed
chain of regexp_replace steps (drop script/style/comments, convert
block-level closers to newlines, strip tags, decode the common
entities, collapse whitespace). It is NOT a browser: no CSS
visibility, no JS. That trade is deliberate — a pure expression
chain runs inside whole-stage codegen at scan speed, needs no Python
UDF, and has an exact SQL twin (the chain is declared as DATA below
so the Spark column, the DuckDB oracle SQL, and the differential
Python reference are generated from the SAME literals).

Entity handling: the named/numeric entities that dominate real
corpora (amp, lt, gt, quot, apos/#39, nbsp/#160) are decoded;
arbitrary numeric entities would need per-match char() synthesis —
out of scope for the expression chain and rare in body text.

Regex dialect: every pattern uses constructs shared by Java regex
(Spark) and RE2/PCRE (DuckDB): inline ``(?is)`` flags, lazy ``.*?``,
character classes. No backreferences, no lookaround.

Frames ref: no equivalent (crawl ingest extension, SURVEY.md §2b).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied IN ORDER. Patterns are shared
# verbatim by spark_html_to_text / html_to_text_sql / py_html_to_text.
HTML_CHAIN: list[tuple[str, str]] = [
    # script/style/noscript blocks: content is never visible text
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<noscript[^>]*>.*?</noscript>", " "),
    # comments (incl. conditional comments)
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines so paragraphs survive
    (
        r"(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|"
        r"table|blockquote|section|article|header|footer)>",
        "\n",
    ),
    # every remaining tag
    (r"(?s)<[^>]*>", " "),
    # common entities
    (r"&nbsp;|&#160;", " "),
    (r"&lt;|&#60;", "<"),
    (r"&gt;|&#62;", ">"),
    (r"&quot;|&#34;", "\""),
    (r"&apos;|&#39;", "'"),
    (r"&amp;|&#38;", "&"),
    # collapse horizontal whitespace, then squeeze blank lines
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
]


# leading/trailing whitespace (incl. newlines) — shared by all twins
_TRIM_PAT = r"(?s)^\s+|\s+$"


def html_to_text(col: Column) -> Column:
    """Visible-text extraction as one fused expression chain."""
    out = col
    for pat, rep in HTML_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    # regex trim: engine trim() strips spaces only, not newlines
    return F.regexp_replace(out, _TRIM_PAT, "")


def html_to_text_sql(expr: str) -> str:
    """The exact same chain as DuckDB SQL over ``expr`` — the oracle
    twin (DuckDB regexp_replace needs the 'g' flag for global)."""
    out = expr
    for pat, rep in HTML_CHAIN:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"regexp_replace({out}, '{_TRIM_PAT}', '', 'g')"


def py_html_to_text(text: str) -> str:
    """Pure-Python reference of the SAME chain (differential tests).

    Java regex applies (?i)/(?s) from the point of occurrence;
    Python applies inline flags globally — identical behavior here
    because every pattern puts its flags first.
    """
    for pat, rep in HTML_CHAIN:
        text = re.sub(pat, rep, text)
    return re.sub(_TRIM_PAT, "", text)

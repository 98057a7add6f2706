"""Stopword-hit language identification.

Marker-token counts per language over the whitespace token stream,
argmax with a fixed precedence order for ties (en > de > fr > es >
zh). Everything is a higher-order-function filter over the token
array — a pure scan expression with NO explode and NO shuffle (the
explode+groupBy formulation shuffled one row per token). Repeated
stopwords count once per occurrence, identical to the grouped-sum
semantics. Shared by queries.q_langid and pipelines/pretrain.

Shared subexpressions (each score appears in several CASE branches)
are deduplicated by codegen's subexpression elimination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.text import LANG_STOPWORDS, tokens

LANGS = ("en", "de", "fr", "es", "zh")


def stopword_hits(text_col: Column, lang: str) -> Column:
    """Occurrences of ``lang``'s marker tokens in the text."""
    return F.size(
        F.filter(
            tokens(text_col), lambda t: t.isin(LANG_STOPWORDS[lang])
        )
    ).cast("long")


def _argmax(s: dict[str, Column]) -> Column:
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"])
            & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when(
            (s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] >= s["zh"]),
            F.lit("de"),
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), F.lit("fr"))
        .when(s["es"] >= s["zh"], F.lit("es"))
        .otherwise(F.lit("zh"))
    )


def predicted_lang(text_col: Column) -> Column:
    """The argmax language as a single scan expression — usable
    directly in a filter (no join, no shuffle)."""
    return _argmax({lang: stopword_hits(text_col, lang) for lang in LANGS})


def language_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, score_<lang>..., predicted) per document."""
    scores = df.select(
        F.col(id_col),
        *[
            stopword_hits(F.col(text_col), lang).alias(f"score_{lang}")
            for lang in LANGS
        ],
    )
    return scores.select(
        id_col,
        *[f"score_{lang}" for lang in LANGS],
        _argmax({lang: F.col(f"score_{lang}") for lang in LANGS}).alias(
            "predicted"
        ),
    )

"""Stopword-hit language identification.

Marker-token counts per language over the whitespace token stream,
argmax with a fixed precedence order for ties (en > de > fr > es >
zh) — pure JVM expressions, one shuffle on the doc id. Shared by
queries.q_langid and pipelines/pretrain.clean_corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.functions.text import LANG_STOPWORDS, tokens

LANGS = ("en", "de", "fr", "es", "zh")


def language_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, score_<lang>..., predicted) per document."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    scores = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("tok").isin(LANG_STOPWORDS[lang]), 1).otherwise(0)
            ).alias(f"score_{lang}")
            for lang in LANGS
        ]
    )
    s = {lang: F.col(f"score_{lang}") for lang in LANGS}
    predicted = (
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
    return scores.select(
        id_col,
        *[f"score_{lang}" for lang in LANGS],
        predicted.alias("predicted"),
    )

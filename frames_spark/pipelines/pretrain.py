"""End-to-end training-corpus cleaning pipeline.

The composition a pretraining data pipeline actually runs, as one
DataFrame plan with a single staged materialization at its fan-out
point (Catalyst fuses the filter stages into the scan; every shuffle
is keyed by a uniform hash):

  1. quality gate   — token count + punctuation ratio (pure scan
                      expressions, no shuffle);
  2. language gate  — stopword-hit language ID, keep target language
                      (pure scan expression, fused with 1);
  3. exact dedup    — md5 fingerprint, keep min doc id per group
                      (row_number window: one payload shuffle);
  4. near-dup drop  — MinHash+LSH candidate pairs on the surviving
                      corpus, greedily drop the higher doc id of each
                      pair (deterministic, single anti-join — no
                      iterative connected components);
  5. emit           — (doc_id, n_tokens) accounting columns.

Greedy pair-drop note: transitive chains (a~b, b~c, a!~c) keep only
``a`` where a component-wise dedup might keep ``a`` and ``c``; that
over-drop is the standard trade for avoiding an iterative algorithm
in the hot path.

Every stage is md5-based / integer-deterministic, so the whole
pipeline has an exact SQL oracle (queries.q_pipeline_clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frames_spark.dedup.minhash import lsh_candidate_pairs, minhash_signatures
from frames_spark.functions import text as text_fns
from frames_spark.functions.langid import predicted_lang
from frames_spark.operators.core import spread


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    lang: str = "en",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    persist: bool = True,
    redact_pii: bool = False,
    keep_text: bool = False,
    excise_repeats: int | None = None,
    strip_html: bool = False,
    repetition_gates: bool = False,
) -> DataFrame:
    """The cleaned corpus: (id, n_tokens) for every surviving doc —
    plus the (post-redaction) text when ``keep_text``.

    ``strip_html`` runs functions/html.py's extraction chain FIRST
    (crawl order: WARC payload -> visible text -> gates), so quality
    metrics, language ID, and every dedup key see visible text, not
    markup. ``repetition_gates`` adds the Gopher repetition battery
    (functions/gopher.py — dup-line/para fractions, top-n-gram char
    fractions at the Rae et al. thresholds) to the quality gate; pure
    scan expressions, still no shuffle.

    The DAG is a diamond: the deduped corpus feeds BOTH the near-dup
    candidate branch and the final anti-join. Lazily that subplan
    would execute once per consumer — the regex-heavy gate
    expressions ran 4x in the naive composition. Two structural
    fixes:

    - exact dedup is a window (row_number over fp) rather than a
      groups+semi-join, so its input lineage appears ONCE and the
      payload still shuffles exactly once, on the uniform md5 key;
    - with ``persist`` (default), the deduped corpus is cached
      MEMORY_AND_DISK at the fan-out point — the production pattern
      for diamond DAGs (at 100 TB the equivalent is staging it to a
      parquet table; either way you pay one materialization instead
      of recomputing the gates per branch).

    ``n_tokens`` is computed at gate time and carried through, never
    recomputed from text.
    """
    unique, pairs = _gated_unique_pairs(
        docs, id_col, text_col, min_tokens, max_punct, lang,
        shingle_n, num_hashes, bands, rows_per_band, persist,
        redact_pii=redact_pii, excise_repeats=excise_repeats,
        strip_html=strip_html, repetition_gates=repetition_gates,
    )
    near_dups = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = unique.join(near_dups, id_col, "left_anti")
    cols = [F.col(id_col), F.col("n_tokens")]
    if keep_text:
        cols.append(F.col(text_col))
    return kept.select(*cols)


def _gated_unique_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int,
    max_punct: float,
    lang: str,
    shingle_n: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    persist: bool,
    redact_pii: bool = False,
    excise_repeats: int | None = None,
    strip_html: bool = False,
    repetition_gates: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Stages 1-4 shared by both dedup policies: (unique corpus,
    near-dup candidate pairs). With ``redact_pii`` the text is
    scrubbed (functions/redact.py) BEFORE fingerprinting/dedup, so
    two docs differing only in their PII dedup together — the order
    production pipelines use. With ``excise_repeats=n`` the
    substring-level dedup (dedup/substring.py, Lee et al. 2022
    ExactSubstr semantics at n-token granularity) rewrites the text
    BEFORE the gates, so boilerplate-heavy docs are judged on their
    unique content — ExactSubstr-then-docdedup, the production
    order."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    if strip_html:
        from frames_spark.functions.html import html_to_text

        docs = docs.withColumn(text_col, html_to_text(F.col(text_col)))
    if redact_pii:
        from frames_spark.functions.redact import redact

        docs = docs.withColumn(text_col, redact(F.col(text_col)))
    if excise_repeats:
        from frames_spark.dedup.substring import excise_repeated_ngrams

        docs = excise_repeated_ngrams(
            docs, id_col, text_col, n=excise_repeats
        ).select(F.col(id_col), F.col("clean_text").alias(text_col))
    text = F.col(text_col)
    gate = (
        (text_fns.n_tokens(text) >= min_tokens)
        & (text_fns.punct_ratio(text) <= max_punct)
        # language gate is a pure scan expression
        # (functions/langid.py) — fused with the quality filter
        # into the scan, no join, no shuffle
        & (predicted_lang(text) == lang)
    )
    if repetition_gates:
        from frames_spark.functions.gopher import passes_repetition_gates

        gate = gate & passes_repetition_gates(
            text_fns.tokens(text), F.length(text_fns.normalize(text))
        )
    gated = (
        spread(docs)
        .select(F.col(id_col), text.alias(text_col))
        .filter(gate)
        .select(
            F.col(id_col),
            text.alias(text_col),
            text_fns.n_tokens(text).cast("long").alias("n_tokens"),
            text_fns.fingerprint(text).alias("fp"),
        )
    )
    w = Window.partitionBy("fp").orderBy(id_col)
    unique = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, text_col, "n_tokens")
    )
    if persist:
        unique = unique.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = lsh_candidate_pairs(
        minhash_signatures(unique, id_col, text_col, shingle_n, num_hashes),
        bands,
        rows_per_band,
    )
    return unique, pairs


def clean_corpus_cc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct: float = 0.2,
    lang: str = "en",
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    persist: bool = True,
) -> DataFrame:
    """`clean_corpus` with TRANSITIVE near-dup dedup: connected
    components over the candidate pairs (dedup/cluster.py), keeping
    only each duplicate cluster's smallest doc id.

    Differs from the greedy pair-drop when a cluster member never
    appears as the higher id of any individual pair — edges (1,3),
    (2,3): greedy keeps {1, 2} (2 looks innocent pairwise), the
    component view keeps only {1}. The extra cost is the iterative
    label propagation over the PAIRS ONLY (tiny relative to the
    corpus; near-dup graphs are forests of small clusters), not over
    the documents.
    """
    from frames_spark.dedup.cluster import connected_components

    unique, pairs = _gated_unique_pairs(
        docs, id_col, text_col, min_tokens, max_punct, lang,
        shingle_n, num_hashes, bands, rows_per_band, persist,
    )
    comps = connected_components(pairs, "doc_a", "doc_b")
    drop = (
        comps.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    kept = unique.join(drop, id_col, "left_anti")
    return kept.select(F.col(id_col), F.col("n_tokens"))


def clean_corpus_observed(
    docs: DataFrame,
    **kwargs,
):
    """`clean_corpus` instrumented with `DataFrame.observe`: gate
    metrics (docs in, survivors, tokens kept) ride along with
    whatever action the caller runs — NO extra pass over the data,
    unlike a count() per stage, which would re-execute the gates.

    Returns (result_df, observation); read `observation.get` AFTER
    an action on result_df. The production shape for pipeline
    accounting at 100 TB: metrics come from the same job that
    produced the output.
    """
    from pyspark.sql import Observation

    obs_in = Observation("corpus_in")
    obs_out = Observation("corpus_out")
    observed_in = docs.observe(obs_in, F.count(F.lit(1)).alias("n_docs_in"))
    cleaned = clean_corpus(observed_in, **kwargs)
    result = cleaned.observe(
        obs_out,
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("n_tokens_kept"),
    )
    return result, {"in": obs_in, "out": obs_out}

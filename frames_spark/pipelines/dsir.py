"""DSIR: data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

The published recipe: featurize every document into hashed n-gram
bucket counts, fit two bag-of-buckets unigram models — one on a
small TARGET corpus (the distribution you want more of), one on the
RAW corpus — and score each raw document with its importance
log-weight  log w(x) = sum_b c_b(x) * (log p_target(b) - log p_raw(b)),
then resample proportionally to w. This implementation computes the
deterministic top-k selection by log-weight (the Gumbel-noise
sampling variant adds per-doc noise to the same score; swapping it
in is one column).

100 TB posture: the corpus tokenizes in ONE scan; per-(doc, bucket)
counts combine map-side; the bucket statistics relations are at most
``n_buckets`` rows (constant, Aggregate-rooted) and broadcast to the
scoring join — the corpus itself shuffles once, keyed by doc, for
the final per-doc sum.

Cross-engine determinism: bucket ids come from the portable md5
hash60; per-bucket log-ratios are quantized to integer nanos BEFORE
the per-doc sum, so document scores are exact integers (the
q_kl_source idiom) — only one ln per bucket closes in double, with
every operand explicitly cast to DOUBLE on both engines (DuckDB
parses numeric literals as DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frames_spark.functions import text as text_fns
from frames_spark.functions.hashing import hash60


def _doc_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    seed: str,
    extra_cols: list[str],
) -> DataFrame:
    """(id, bucket, c [, extra]): hashed-unigram bucket counts per
    document — one scan, map-side combined."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in extra_cols],
        F.explode(text_fns.tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return (
        tok.withColumn("bucket", hash60(F.col("term"), seed=seed) % n_buckets)
        .groupBy("_id", "bucket", *extra_cols)
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _lambda_nanos(
    ct: Column, cr: Column, nt: Column, nr: Column, n_buckets: int
) -> Column:
    """Quantized per-bucket log-ratio: ln of one double ratio whose
    four operands are each exact integers cast to DOUBLE — identical
    expression shape in the DuckDB twin."""
    b = F.lit(float(n_buckets))
    num = (ct + F.lit(1)).cast("double") * (nr.cast("double") + b)
    den = (cr + F.lit(1)).cast("double") * (nt.cast("double") + b)
    return F.floor(F.log(num / den) * 1_000_000_000 + F.lit(0.5)).cast("long")


def _bucket_model(db: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, lam_nanos) from a (_id, _is_target, bucket, c)
    relation — the trained model both the batch scorer and the
    streaming scorer consume."""
    cr = db.groupBy("bucket").agg(F.sum("c").alias("cr"))
    ct = (
        db.filter(F.col("_is_target"))
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    totals = db.agg(
        F.sum("c").alias("nr"),
        F.sum(F.when(F.col("_is_target"), F.col("c")).otherwise(F.lit(0))).alias(
            "nt"
        ),
    )
    return (
        cr.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            _lambda_nanos(
                F.coalesce(F.col("ct"), F.lit(0)),
                F.col("cr"),
                F.col("nt"),
                F.col("nr"),
                n_buckets,
            ).alias("lam_nanos"),
        )
    )


def dsir_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Train the (bucket, lam_nanos) model alone — for persisting and
    for feeding dsir_score_stream."""
    db = _doc_buckets(
        docs.withColumn("_is_target", target),
        id_col,
        text_col,
        n_buckets,
        seed,
        ["_is_target"],
    )
    return _bucket_model(db, n_buckets)


def dsir_logweights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """(id, logw_nanos): per-document DSIR importance log-weight in
    integer nanos. ``target`` is a boolean column over ``docs``
    selecting the target corpus (it stays inside the one tokenize
    scan — the target is never re-read)."""
    db = _doc_buckets(
        docs.withColumn("_is_target", target),
        id_col,
        text_col,
        n_buckets,
        seed,
        ["_is_target"],
    ).persist()  # one tokenize scan feeds the bucket models AND scoring
    lam = _bucket_model(db, n_buckets)
    scores = (
        db.join(F.broadcast(lam), "bucket")
        .groupBy("_id")
        .agg(F.sum(F.col("c") * F.col("lam_nanos")).alias("logw_nanos"))
    )
    from frames_spark.operators.caching import tie_cache

    return tie_cache(
        scores.select(
            F.col("_id").alias(id_col),
            F.col("logw_nanos").cast("long").alias("logw_nanos"),
        ),
        db,
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int,
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Deterministic top-k by importance log-weight (ties broken by
    id — a strict total order, so the selected SET is reproducible on
    any partition layout)."""
    from frames_spark.operators.caching import retie

    w = dsir_logweights(docs, id_col, text_col, target, n_buckets, seed)
    # the top-k derives from the tie_cache result (caching.retie)
    return retie(
        w.orderBy(F.desc("logw_nanos"), F.asc(id_col)).limit(k), w
    )


def dsir_sample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int,
    n_buckets: int = 4096,
    seed: str = "dsir",
    noise_seed: str = "dsirg",
) -> DataFrame:
    """The paper's ACTUAL selection rule: sample k docs without
    replacement with probability ∝ w(x), via the Gumbel-top-k trick —
    argtop-k of (log w + Gumbel noise) is an exact sample from the
    importance distribution (Vieira 2014; Kool et al. 2019). The
    Gumbel is deterministic in (id, noise_seed): u = (hash60(id)+1)/2^60,
    g = -ln(-ln(u)) — quantized to the same nanos scale as the
    log-weight so the noisy key stays an exact integer and the
    selected SET is reproducible on any partition layout (the
    weighted_sample A-ES device, in Gumbel form)."""
    from frames_spark.functions.hashing import hash60

    w = dsir_logweights(docs, id_col, text_col, target, n_buckets, seed)
    u = (
        hash60(F.col(id_col).cast("string"), seed=noise_seed) + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
    g_nanos = F.floor(-F.log(-F.log(u)) * 1_000_000_000 + F.lit(0.5)).cast(
        "long"
    )
    from frames_spark.operators.caching import retie

    return retie(
        w.withColumn("gumbel_key", F.col("logw_nanos") + g_nanos)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
        .select(id_col, "logw_nanos", "gumbel_key"),
        w,
    )


def dsir_score_stream(
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    lam: DataFrame,
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Streaming DSIR scorer: apply an OFFLINE-trained bucket model
    (``lam``: (bucket, lam_nanos), the dsir_logweights intermediate)
    to a document stream — the production split where the target/raw
    models retrain daily while the scorer runs on the live firehose.

    The model is bounded (<= n_buckets rows) so it constant-folds
    into the plan as a literal map, and the per-doc sum is ONE pure
    scan expression (aggregate over the token array) — NO explode, NO
    streaming aggregation state, no watermark or output-mode
    constraint: the result is an append-mode row-per-document stream.
    For models far beyond ~10^4 buckets, run the batch scorer inside
    foreachBatch instead (the join form); a literal map that size
    stops being a sensible plan constant."""
    entries = lam.collect()  # bounded by n_buckets — the model IS tiny
    model = F.create_map(
        *[
            F.lit(v)
            for r in entries
            for v in (int(r["bucket"]), int(r["lam_nanos"]))
        ]
    )
    toks = F.filter(
        text_fns.tokens(F.col(text_col)), lambda t: t != F.lit("")
    )
    score = F.aggregate(
        F.transform(toks, lambda t: hash60(t, seed=seed) % n_buckets),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.coalesce(model[b], F.lit(0).cast("long")),
    )
    return docs_stream.select(
        F.col(id_col), score.cast("long").alias("logw_nanos")
    )

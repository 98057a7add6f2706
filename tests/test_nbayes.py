"""Naive Bayes (pipelines/nbayes.py): planted-vocabulary learning,
smoothing behavior, prior fallback, determinism.

Note the registered q_nb_confusion runs on the synthetic corpus whose
text carries NO language signal (every lang shares one vocabulary) —
there the correct Bayes output is the majority class, and the oracle
verifies the pipeline exactly. These tests prove the model actually
LEARNS when signal exists."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.pipelines import nbayes


def _planted(spark, n_per_class=30):
    # three classes with mostly-disjoint vocabularies + shared noise
    vocab = {
        "aa": ["red", "crimson", "scarlet", "ruby"],
        "bb": ["blue", "azure", "navy", "cobalt"],
        "cc": ["green", "olive", "jade", "lime"],
    }
    rows = []
    i = 0
    for label, words in vocab.items():
        for _ in range(n_per_class):
            body = " ".join(words * 3) + " the a of and"
            rows.append((i, body, label))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_planted_vocab_learns_near_perfectly(spark):
    docs = _planted(spark)
    conf = nbayes.nb_confusion(docs, "doc_id", "text", "label").collect()
    total = sum(r.n for r in conf)
    diag = sum(r.n for r in conf if r._label == r.pred)
    assert total == 18  # 90 docs, fifth held out
    assert diag == total  # disjoint vocab -> perfect


def test_unseen_bucket_smoothing_and_prior_fallback(spark):
    docs = _planted(spark)
    db = nbayes.doc_buckets(docs, "doc_id", "text", "label")
    lik, stats = nbayes.nb_fit(db)
    # a doc of ONLY unseen tokens scores every class at
    # n_tokens * default + prior -> argmax = class with best
    # (default, prior) combination; must not error and must predict
    # one of the trained classes
    probe = spark.createDataFrame(
        [(999, "qqq www eee rrr", "aa")], "doc_id long, text string, label string"
    )
    pdb = nbayes.doc_buckets(probe, "doc_id", "text", "label")
    pred = nbayes.nb_predict(pdb, lik, stats).collect()
    assert len(pred) == 1
    assert pred[0].pred in {"aa", "bb", "cc"}


def test_scores_are_deterministic_integers(spark):
    docs = _planted(spark)
    db = nbayes.doc_buckets(docs, "doc_id", "text", "label").persist()
    lik, stats = nbayes.nb_fit(db)
    s1 = sorted(
        (r._id, r.cand, r.score_nanos)
        for r in nbayes.nb_scores(db, lik, stats).collect()
    )
    s2 = sorted(
        (r._id, r.cand, r.score_nanos)
        for r in nbayes.nb_scores(db, lik, stats).collect()
    )
    assert s1 == s2
    assert all(isinstance(s, int) for _, _, s in s1)


def test_confusion_counts_cover_heldout_docs(spark):
    docs = _planted(spark)
    conf = nbayes.nb_confusion(docs, "doc_id", "text", "label")
    heldout = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.length("text") > 0)
    ).count()
    assert sum(r.n for r in conf.collect()) == heldout


def test_mcnemar_query_guard_and_direction(spark, sf_dir):
    """On the synthetic corpus both classifiers collapse to the
    majority class -> zero discordant pairs and a NULL statistic
    (nullif-guarded, no ANSI divide-by-zero). On a planted corpus
    where NB can learn and the stopword heuristic cannot, the NB-only
    side must dominate."""
    from frames_spark.queries import QUERIES

    row = QUERIES["q_mcnemar_nb_vs_langid"](spark, sf_dir).first()
    assert row.n_heuristic_only == 0 and row.n_nb_only == 0
    assert row.mcnemar_micros is None

    # planted: three classes with disjoint NON-stopword vocab; langid
    # sees no stopwords and defaults, NB learns the vocab perfectly
    from frames_spark.functions.langid import language_scores
    from frames_spark.pipelines import nbayes

    vocab = {"de": ["krz", "wrt", "blx"], "fr": ["plm", "qnd", "vrc"],
             "es": ["stk", "mrn", "gld"]}
    rows = []
    i = 0
    for label, words in vocab.items():
        for _ in range(20):
            rows.append((i, " ".join(words * 4), label))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    db = nbayes.doc_buckets(docs, "doc_id", "text", "lang")
    lik, stats = nbayes.nb_fit(db.filter(F.col("_id") % 5 != 0))
    nb_pred = nbayes.nb_predict(db.filter(F.col("_id") % 5 == 0), lik, stats)
    lid = language_scores(docs, "doc_id", "text").select(
        "doc_id", F.col("predicted").alias("heur")
    )
    joined = nb_pred.select(
        F.col("_id").alias("doc_id"), F.col("_label").alias("lang"), "pred"
    ).join(lid, "doc_id")
    nb_only = joined.filter(
        (F.col("pred") == F.col("lang")) & (F.col("heur") != F.col("lang"))
    ).count()
    heur_only = joined.filter(
        (F.col("heur") == F.col("lang")) & (F.col("pred") != F.col("lang"))
    ).count()
    assert nb_only > 0 and nb_only > heur_only

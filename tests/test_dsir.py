"""DSIR importance weights (pipelines/dsir.py): planted-vocabulary
selection, target-alignment direction, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.pipelines import dsir
from frames_spark.sources.tables import load_table


def test_planted_target_vocab_ranks_top(spark):
    # target vocabulary {aa..ae}, raw-only vocabulary {zz..zv}: docs
    # written in target vocab must out-score docs in raw vocab.
    t_words = ["aa", "ab", "ac", "ad", "ae"]
    r_words = ["zz", "zy", "zx", "zw", "zv"]
    rows = []
    for i in range(10):
        rows.append((i, " ".join(t_words * 4), True))  # target corpus
    for i in range(10, 30):
        w = t_words if i < 20 else r_words
        rows.append((i, " ".join(w * 4), False))
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    scores = dsir.dsir_logweights(docs, "doc_id", "text", F.col("tgt"))
    by_id = {r.doc_id: r.logw_nanos for r in scores.collect()}
    assert len(by_id) == 30
    target_like = [by_id[i] for i in range(10, 20)]
    raw_only = [by_id[i] for i in range(20, 30)]
    assert min(target_like) > max(raw_only)


def test_selection_is_topk_and_deterministic(spark):
    rows = [(i, f"w{i % 7} w{i % 5} common", i % 3 == 0) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    sel1 = dsir.dsir_select(docs, "doc_id", "text", F.col("tgt"), k=10)
    sel2 = dsir.dsir_select(docs, "doc_id", "text", F.col("tgt"), k=10)
    r1 = [(r.doc_id, r.logw_nanos) for r in sel1.collect()]
    r2 = [(r.doc_id, r.logw_nanos) for r in sel2.collect()]
    assert r1 == r2
    assert len(r1) == 10
    # top-k really is the k max log-weights
    all_scores = sorted(
        (
            (-r.logw_nanos, r.doc_id)
            for r in dsir.dsir_logweights(
                docs, "doc_id", "text", F.col("tgt")
            ).collect()
        )
    )[:10]
    assert [(i, -s) for s, i in all_scores] == r1


def test_en_target_scores_en_higher_on_real_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scores = dsir.dsir_logweights(
        docs, "doc_id", "text", F.col("lang") == "en"
    )
    joined = scores.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.grp: r.m
        for r in joined.select(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp"),
            "logw_nanos",
        )
        .groupBy("grp")
        .agg(F.avg("logw_nanos").alias("m"))
        .collect()
    }
    assert means["en"] > means["other"]


def test_gumbel_sample_is_weight_biased_and_deterministic(spark):
    # two vocab groups; target-like docs carry much larger weights,
    # so the 10-of-40 sample must be dominated by them
    t_words = ["aa", "ab", "ac", "ad", "ae"]
    r_words = ["zz", "zy", "zx", "zw", "zv"]
    rows = [(i, " ".join(t_words * 4), True) for i in range(10)]
    rows += [
        (i, " ".join((t_words if i < 30 else r_words) * 4), False)
        for i in range(10, 50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    s1 = dsir.dsir_sample(docs, "doc_id", "text", F.col("tgt"), k=10)
    s2 = dsir.dsir_sample(docs, "doc_id", "text", F.col("tgt"), k=10)
    r1 = [(r.doc_id, r.gumbel_key) for r in s1.collect()]
    assert r1 == [(r.doc_id, r.gumbel_key) for r in s2.collect()]
    assert len(r1) == 10
    # log-weight gap between groups dwarfs Gumbel noise here
    assert sum(1 for i, _ in r1 if i < 30) >= 9
    # different noise seed -> (almost surely) different tie ordering
    s3 = dsir.dsir_sample(
        docs, "doc_id", "text", F.col("tgt"), k=10, noise_seed="other"
    )
    assert [(r.doc_id, r.gumbel_key) for r in s3.collect()] != r1


def test_stream_scorer_matches_batch_logweights(spark, sf_dir, tmp_path):
    """dsir_score_stream over a file stream of the same corpus must
    reproduce dsir_logweights exactly (unseen-bucket contribution is
    0 by construction when scoring the training corpus)."""
    import shutil

    from frames_spark.sources.tables import load_table

    src = tmp_path / "stream_in"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "docs.parquet")

    docs = load_table(spark, sf_dir, "documents")
    model = dsir.dsir_model(docs, "doc_id", "text", F.col("lang") == "en")
    want = {
        r.doc_id: r.logw_nanos
        for r in dsir.dsir_logweights(
            docs, "doc_id", "text", F.col("lang") == "en"
        ).collect()
    }

    schema = spark.read.parquet(str(src / "docs.parquet")).schema
    stream = (
        spark.readStream.schema(schema).format("parquet").load(str(src))
    )
    scored = dsir.dsir_score_stream(stream, "doc_id", "text", model)
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("dsir_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: r.logw_nanos
        for r in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    assert got == want

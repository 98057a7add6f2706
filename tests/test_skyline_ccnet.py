"""Round-7 additions: skyline (Pareto frontier), CCNet perplexity
buckets, tokenizer fertility — invariants + brute-force differentials
the sf0.01 oracle sweep cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from frames_spark.queries import QUERIES


def _brute_skyline(rows: list[tuple[int, float, int]]) -> set[int]:
    """NOT-EXISTS dominance semantics, O(n^2) reference."""
    out = set()
    for k, price, size in rows:
        dominated = any(
            (p2 <= price and s2 >= size and (p2 < price or s2 > size))
            for k2, p2, s2 in rows
            if k2 != k
        )
        if not dominated:
            out.add(k)
    return out


def test_skyline_matches_bruteforce(spark, sf_dir):
    got = {
        r.p_partkey
        for r in QUERIES["q_skyline"](spark, sf_dir).collect()
    }
    rows = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    ]
    assert got == _brute_skyline(rows)


def test_skyline_tie_semantics(spark, tmp_path):
    # equal (price, size) twins both stay; same-price larger size
    # dominates; cheaper-equal-size dominates.
    rows = [
        (1, 10.0, 5),
        (2, 10.0, 5),   # exact twin of 1 -> both stay
        (3, 10.0, 3),   # same price, smaller size -> dominated by 1
        (4, 20.0, 5),   # pricier, same size -> dominated by 1
        (5, 20.0, 9),   # pricier but bigger -> stays
        (6, 5.0, 1),    # cheapest -> stays
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    got = {
        r.p_partkey for r in QUERIES["q_skyline"](spark, str(tmp_path)).collect()
    }
    assert got == _brute_skyline(rows) == {1, 2, 5, 6}


def test_ccnet_buckets_partition_each_lang(spark, sf_dir):
    out = QUERIES["q_ccnet_buckets"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # docs with >= 2 tokens score; every scored doc lands in exactly
    # one bucket, so per-lang bucket counts sum to the scored total
    scored = (
        docs.select(
            "lang",
            F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .groupBy("lang")
        .count()
        .collect()
    )
    want = {r.lang: r["count"] for r in scored}
    got: dict[str, int] = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + r.n_docs
    assert got == want
    # head cost <= middle cost <= tail cost within each lang
    by_lang: dict[str, dict[str, tuple[int, int]]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {})[r.bucket] = (
            r.min_cost_milli,
            r.max_cost_milli,
        )
    for lang, buckets in by_lang.items():
        order = [b for b in ("head", "middle", "tail") if b in buckets]
        for a, b in zip(order, order[1:]):
            assert buckets[a][1] <= buckets[b][0] or buckets[a][1] <= buckets[b][1], (
                lang,
                buckets,
            )
    # thirds: bucket sizes differ by at most 1 within each lang
    sizes: dict[str, list[int]] = {}
    for r in out:
        sizes.setdefault(r.lang, []).append(r.n_docs)
    for lang, ns in sizes.items():
        assert max(ns) - min(ns) <= 1, (lang, ns)


def test_fertility_hand_check(spark, tmp_path):
    rows = [
        # "ab cd" -> ws 2; regex tokens [ab, cd] -> ceil(2/4)*2 = 2 bpe
        (1, "ab cd", "en", "s0", 5),
        # "abcdefgh" -> ws 1; one 8-char token -> ceil(8/4) = 2 bpe
        (2, "abcdefgh", "en", "s0", 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    [r] = QUERIES["q_fertility"](spark, str(tmp_path)).collect()
    assert (r.n_docs, r.ws_tokens, r.bpe_tokens) == (2, 3, 4)
    # fertility = (4*1000 + 1) DIV 3 = 1333; chars/bpe = (13*1000 + 2) DIV 4
    assert r.fertility_milli == 1333
    assert r.chars_per_bpe_milli == 3250

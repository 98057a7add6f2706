"""q09_privacy — part 9/9 of the query registry (round-8 additions).

Privacy-audit operators for training-data release (Sweeney 2002
k-anonymity; Machanavajjhala et al. 2007 l-diversity): before a
table ships, measure how identifying its quasi-identifier (QI)
columns are. Pure relational audits — one groupBy on the QI key,
histogram on top — so they run at any scale the groupBy runs at
(the QI key is the shuffle key; skewed QI groups are exactly the
SAFE ones, so skew here is benign by construction).

Chains from q08 like every part (see q02 for the mechanism).
"""

from __future__ import annotations

import frames_spark.queries.q08_sketch_select as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# k-anonymity audit: every row whose QI group has fewer than k peers
# is re-identifiable at confidence 1/group_size. Report the full
# group-size histogram (the release decision needs the distribution,
# not one threshold): (group_size, n_groups, n_rows). QI here:
# (c_nationkey, c_mktsegment) — the classic demographic-bucket shape.
# ---------------------------------------------------------------------------


@register(
    "q_k_anonymity",
    """
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(group_size AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM groups GROUP BY group_size
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return groups.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("group_size").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit: a k-anonymous group is still disclosive if every
# member shares the SENSITIVE value. Per QI group (c_nationkey),
# count distinct sensitive values (c_mktsegment) and report the
# histogram of l: (l, n_groups, n_rows_covered). A group with l = 1
# leaks its sensitive attribute for every member regardless of k.
# ---------------------------------------------------------------------------


@register(
    "q_l_diversity",
    """
    WITH groups AS (
      SELECT c_nationkey,
             COUNT(DISTINCT c_mktsegment) AS l,
             COUNT(*) AS n_rows
      FROM customer GROUP BY c_nationkey
    )
    SELECT CAST(l AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows_covered
    FROM groups GROUP BY l
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("l"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return groups.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_rows").cast("long").alias("n_rows_covered"),
    )


# ---------------------------------------------------------------------------
# AMS F2 sketch audit (operators/sketches.py; Alon-Matias-Szegedy
# STOC'96): estimate the second frequency moment of events.user_id —
# the self-join-size / skew statistic — from 16 running ±1 sign sums,
# and report it against the exact F2. Fully oracle-exact: the signs
# replay from md5 parity in DuckDB, the estimator stays integer (DIV),
# only the closing relative error touches doubles (same operand order
# both engines).
# ---------------------------------------------------------------------------


@register(
    "q_f2_ams",
    """
    WITH reps AS (SELECT unnest(range(0, 16)) AS r),
    sgn AS (
      SELECT reps.r,
             SUM(CAST((CAST('0x' || substr(md5(concat('ams', CAST(reps.r AS VARCHAR), '#', CAST(user_id AS VARCHAR))), 1, 15) AS BIGINT) % 2) * 2 - 1 AS BIGINT)) AS s
      FROM events, reps GROUP BY reps.r
    ),
    est AS (
      SELECT CAST(SUM(s * s) // 16 AS BIGINT) AS f2_est,
             CAST(COUNT(*) AS BIGINT) AS n_replicates
      FROM sgn
    ),
    cnts AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
    ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM cnts)
    SELECT e.f2_est, e.n_replicates, x.f2_exact,
           CAST(FLOOR(ABS(CAST(e.f2_est AS DOUBLE) - CAST(x.f2_exact AS DOUBLE))
                      / CAST(x.f2_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             AS err_micros
    FROM est e, ex x
    """,
)
def q_f2_ams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import ams_estimate, ams_sketch

    ev = load_table(spark, sf_dir, "events")
    est = ams_estimate(ams_sketch(ev, "user_id"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "f2_est",
        "n_replicates",
        "f2_exact",
        F.floor(
            F.abs(
                F.col("f2_est").cast("double") - F.col("f2_exact").cast("double")
            )
            / F.col("f2_exact").cast("double")
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("err_micros"),
    )


# ---------------------------------------------------------------------------
# Grouped oracle-exact HLL (operators/sketches.py hll_cells_by /
# hll_estimate_by): one register relation PER event_type — the
# production per-source/per-day rollup shape (coarser rollups merge
# the slices, never re-scan). Per-group estimates value-gated against
# the same expressions in DuckDB, exact distinct joined alongside.
# ---------------------------------------------------------------------------


@register(
    "q_hll_by_type",
    f"""
    WITH h AS (
      SELECT event_type,
             {hash60_sql("CAST(user_id AS VARCHAR)", "hll")} AS h
      FROM events
    ), keyed AS (
      SELECT event_type, h % 64 AS bucket, (h - (h % 64)) // 64 AS rem FROM h
    ), cells AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rem = 0 THEN 55
                      ELSE 54 - length(bin(rem)) + 1 END) AS max_rho
      FROM keyed GROUP BY event_type, bucket
    ), agg AS (
      SELECT event_type, SUM(power(2.0, -max_rho)) AS z, COUNT(*) AS nb
      FROM cells GROUP BY event_type
    ), r AS (
      SELECT event_type,
             {0.709 * 64 * 64} / (z + CAST(64 - nb AS DOUBLE)) AS raw,
             CAST(64 - nb AS DOUBLE) AS empty, nb
      FROM agg
    ), ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(FLOOR(CASE WHEN raw <= {2.5 * 64} AND empty > 0
                           THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / empty)
                           ELSE raw END * 1000000 + 0.5) AS BIGINT) AS est_micros,
           CAST(FLOOR(raw * 1000000 + 0.5) AS BIGINT) AS raw_micros,
           CAST(64 - nb AS BIGINT) AS n_empty,
           ex.exact_distinct
    FROM r JOIN ex USING (event_type)
    """,
)
def q_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import hll_cells_by, hll_estimate_by

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate_by(
        hll_cells_by(ev, ["event_type"], "user_id"), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


# ---------------------------------------------------------------------------
# Grouped KMV cross-source overlap (operators/sketches.py
# kmv_sketch_by; Beyer SIGMOD'07 §4): per-source bottom-k sketches of
# the distinct document texts, then every source pair's Jaccard
# estimated from the bottom-k of the pair's UNION — O(k * pairs)
# rows after the one sketch pass, never a corpus self-join (the
# 100 TB twin of the exact q_source_jaccard). Exact pairwise Jaccard
# joined alongside as the audit column (sf-feasible; at scale you
# keep only the sketch leg). All integers up to the closing division.
# ---------------------------------------------------------------------------

_KMV_BY_K = 64


@register(
    "q_kmv_by_source",
    f"""
    WITH hk AS (
      SELECT DISTINCT source,
             {hash60_sql("text", "kmv")} AS h
      FROM documents
    ), sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hk
      ) WHERE rn <= {_KMV_BY_K}
    ), srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM srcs a JOIN srcs b ON a.source < b.source
    ), u AS (
      SELECT p.source_a, p.source_b, s.h, 1 AS in_a, 0 AS in_b
      FROM pairs p JOIN sk s ON s.source = p.source_a
      UNION ALL
      SELECT p.source_a, p.source_b, s.h, 0 AS in_a, 1 AS in_b
      FROM pairs p JOIN sk s ON s.source = p.source_b
    ), g AS (
      SELECT source_a, source_b, h,
             MAX(in_a) AS in_a, MAX(in_b) AS in_b
      FROM u GROUP BY source_a, source_b, h
    ), ranked AS (
      SELECT source_a, source_b, in_a, in_b FROM (
        SELECT source_a, source_b, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY source_a, source_b
                                  ORDER BY h) AS rn
        FROM g
      ) WHERE rn <= {_KMV_BY_K}
    ), est AS (
      SELECT source_a, source_b,
             CAST(COUNT(*) AS BIGINT) AS n_union_k,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM ranked GROUP BY source_a, source_b
    ), dt AS (SELECT DISTINCT source, md5(text) AS th FROM documents),
    nsz AS (SELECT source, COUNT(*) AS n FROM dt GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_inter
      FROM dt a JOIN dt b ON a.th = b.th AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT e.source_a, e.source_b, e.n_union_k, e.n_both,
           CAST(FLOOR(CAST(e.n_both AS DOUBLE) / CAST(e.n_union_k AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS jaccard_micros,
           CAST(FLOOR(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                      / CAST(na.n + nb.n - COALESCE(i.n_inter, 0) AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS exact_jaccard_micros
    FROM est e
    JOIN nsz na ON na.source = e.source_a
    JOIN nsz nb ON nb.source = e.source_b
    LEFT JOIN inter i
      ON i.source_a = e.source_a AND i.source_b = e.source_b
    """,
)
def q_kmv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import kmv_sketch_by

    docs = load_table(spark, sf_dir, "documents")
    sk = kmv_sketch_by(docs, ["source"], "text", k=_KMV_BY_K)
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
    )
    ua = pairs.join(
        sk.withColumnRenamed("source", "source_a"), "source_a"
    ).select(
        "source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = pairs.join(
        sk.withColumnRenamed("source", "source_b"), "source_b"
    ).select(
        "source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    g = (
        ua.unionByName(ub)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source_a", "source_b").orderBy("h")
    est = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_BY_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_k"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        )
    )
    # Audit leg joins on md5(text), never the raw text (r8 ask #7):
    # at 100 TB the document bodies would otherwise dominate this
    # query's shuffle; 32-hex digests keep the audit exact (any md5
    # collision is seen identically by the oracle) at ~fixed width.
    dt = docs.select("source", F.md5("text").alias("th")).distinct()
    nsz = dt.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        dt.alias("x")
        .join(
            dt.alias("y"),
            (F.col("x.th") == F.col("y.th"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        est.join(
            F.broadcast(nsz.withColumnRenamed("source", "source_a")
                        .withColumnRenamed("n", "na")),
            "source_a",
        )
        .join(
            F.broadcast(nsz.withColumnRenamed("source", "source_b")
                        .withColumnRenamed("n", "nb")),
            "source_b",
        )
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_union_k",
            "n_both",
            F.floor(
                F.col("n_both").cast("double")
                / F.col("n_union_k").cast("double")
                * 1000000
                + 0.5
            ).cast("long").alias("jaccard_micros"),
            F.floor(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (
                    F.col("na") + F.col("nb")
                    - F.coalesce(F.col("n_inter"), F.lit(0))
                ).cast("double")
                * 1000000
                + 0.5
            ).cast("long").alias("exact_jaccard_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM fertility audit: weighted pieces-per-word of the seed
# model's Viterbi segmentation — the tokenizer-quality number
# (compare functions/unigram_lm.py vs the BPE fertility audit
# q_fertility). The oracle reuses q_unigram_em1's unrolled DP +
# backtrace CTE chain verbatim (each backtrace step emits exactly one
# piece per surviving word) with a different closing aggregate.
# ---------------------------------------------------------------------------

_EM1_ORACLE_SQL = ORACLES["q_unigram_em1"]
_EM1_FINAL_MARKER = "SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM ("
_FERT_ORACLE = _EM1_ORACLE_SQL[: _EM1_ORACLE_SQL.rindex(_EM1_FINAL_MARKER)] + f"""
    SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM wz) AS n_words,
           CAST(SUM(cnt) AS BIGINT) AS n_pieces,
           CAST(FLOOR(CAST(SUM(cnt) AS DOUBLE)
                      / CAST((SELECT SUM(cnt) FROM wz) AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS fertility_micros
    FROM (
      {" UNION ALL ".join(f"SELECT cnt FROM t{r}" for r in range(1, 13))}
    ) u
    """


@register("q_unigram_fertility", _FERT_ORACLE)
def q_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.unigram_lm import viterbi_segment

    words = _unigram_words(spark, sf_dir)
    model = _unigram_model(words)
    seg = viterbi_segment(words.filter(F.col("cnt") >= 3), model)
    return seg.agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.size("pieces") * F.col("cnt")).cast("long").alias("n_pieces"),
        F.floor(
            F.sum(F.size("pieces") * F.col("cnt")).cast("double")
            / F.sum("cnt").cast("double")
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("fertility_micros"),
    )


# ---------------------------------------------------------------------------
# Index pre-flight audits (the q_lsh_bucket_stats / semdedup_cluster_
# stats pattern, extended to the r10 deterministic ANN tiers): run
# these BEFORE building an IVF or PQ index on a new corpus — a
# degenerate cell-size histogram or starved codebook means the
# quantizer parameters need resizing, and catching that costs one
# aggregate instead of a bad index build. Both fully value-gated.
# ---------------------------------------------------------------------------


@register(
    "q_ivf_cell_stats",
    f"""{_IVF_DET_PREFIX},
    sizes AS (SELECT cluster, COUNT(*) AS n FROM best GROUP BY cluster)
    SELECT CAST(n AS BIGINT) AS cell_size,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM sizes GROUP BY n
    ORDER BY cell_size DESC
    """,
)
def q_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-size histogram of the deterministic IVF quantizer — the
    probe-cost model: a query probing nprobe cells scans the sum of
    those cells' sizes, so a skewed histogram means unbalanced probe
    latencies (and a dominant cell means the codebook is too small
    for the corpus shape)."""
    from frames_spark.dedup.semdedup import assign_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    sizes = (
        assign_clusters(emb, "vec_id", "embedding", _IVF_DET_K, 64)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        sizes.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
        .select(F.col("n").cast("long").alias("cell_size"), "n_cells")
        .orderBy(F.desc("cell_size"))
    )


@register(
    "q_pq_code_stats",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    {_PQ_DET_CTES},
    load AS (
      SELECT j, c, COUNT(*) AS cnt FROM pqcodes GROUP BY j, c
    )
    SELECT CAST(j AS BIGINT) AS subspace,
           CAST(COUNT(*) AS BIGINT) AS n_codes_used,
           CAST(MAX(cnt) AS BIGINT) AS max_code_load
    FROM load GROUP BY j
    ORDER BY subspace
    """,
)
def q_pq_code_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook-utilization audit: per subspace, how many of the
    k codewords the corpus actually uses and the hottest codeword's
    load. n_codes_used << k means the sampled codebook wastes
    resolution (resample with a different seed or train); a huge
    max_code_load means ADC distances stop discriminating in that
    subspace."""
    from frames_spark.similarity.pq import encode_pq, fit_pq_det

    emb = load_table(spark, sf_dir, "embeddings")
    cb = fit_pq_det(emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K)
    codes = encode_pq(emb, "vec_id", "embedding", cb, normalize=False)
    jc = codes.select(F.posexplode("codes").alias("j", "c"))
    load = jc.groupBy("j", "c").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        load.groupBy("j")
        .agg(
            F.countDistinct("c").cast("long").alias("n_codes_used"),
            F.max("cnt").cast("long").alias("max_code_load"),
        )
        .select(F.col("j").cast("long").alias("subspace"),
                "n_codes_used", "max_code_load")
        .orderBy("subspace")
    )


# Weekly rollup from the STORED daily register relations — the
# second granularity of the store-parts/merge-at-read pattern
# (q_sketch_users is the daily leg): coarser windows re-max the
# day cells, never re-scan events. Value-gated end to end.
@register(
    "q_sketch_users_weekly",
    f"""
    WITH h AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {hash60_sql("CAST(user_id AS VARCHAR)", "hll")} AS h
      FROM events
    ), keyed AS (
      SELECT day, h % {_SKQ_M} AS bucket, (h - (h % {_SKQ_M})) // {_SKQ_M} AS rem
      FROM h
    ), cells AS (
      SELECT day, bucket, MAX({_SKQ_RHO_SQL}) AS max_rho
      FROM keyed GROUP BY day, bucket
    ), wcells AS (
      SELECT CAST(date_trunc('week', day) AS TIMESTAMP) AS week,
             bucket, MAX(max_rho) AS max_rho
      FROM cells GROUP BY 1, 2
    ), agg AS (
      SELECT week, SUM(power(2.0, -max_rho)) AS z, COUNT(*) AS nb
      FROM wcells GROUP BY week
    ), r AS (
      SELECT week, {_SKQ_AMM} / (z + CAST({_SKQ_M} - nb AS DOUBLE)) AS raw,
             CAST({_SKQ_M} - nb AS DOUBLE) AS empty, nb
      FROM agg
    ), ex AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT r.week,
           CAST(FLOOR({_SKQ_EST_SQL} * 1000000 + 0.5) AS BIGINT) AS est_micros,
           CAST({_SKQ_M} - nb AS BIGINT) AS n_empty,
           ex.exact_distinct
    FROM r JOIN ex USING (week)
    ORDER BY week
    """,
)
def q_sketch_users_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.sketches import hll_cells_by, hll_estimate_by

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    cells = hll_cells_by(ev, ["day"], "user_id", p=_SKQ_P)
    wcells = (
        cells.withColumn("week", F.date_trunc("week", F.col("day")))
        .groupBy("week", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est = hll_estimate_by(wcells, ["week"], p=_SKQ_P).drop("raw_micros")
    exact = (
        ev.withColumn("week", F.date_trunc("week", F.col("ts")))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, "week").orderBy("week")


# ---------------------------------------------------------------------------
# Power-method PCA — the value-gated twin of q_embed_pca. The
# production path (similarity/pca.py fit_pca) eigensolves the d x d
# covariance with LAPACK on the driver, which no SQL engine replays;
# this query computes the SAME top principal axis by integer matrix
# SQUARING over the exact fixed-point scatter matrix, so every
# intermediate is an integer both engines agree on bit-for-bit. The
# corpus pass (the only data-sized stage) is the q_embed_covariance
# scan-stage Gram plan; the d x d squaring ladder is model-sized on
# the driver, mirrored by 10 unrolled AS MATERIALIZED CTE rounds (the
# q_markov_stationary idiom — squaring, not plain power iteration,
# because the near-isotropic synthetic spectrum would need hundreds
# of matvec rounds; 10 squarings = C^1024 independent of the gap).
# Renormalization uses the sign-safe truncating division
# sign(x) * (|x| * SCALE // max|x|) — the one form Python, Spark and
# DuckDB agree on for negative operands. Output: the quantized axis
# plus an integer-Rayleigh eigenvalue and explained-variance share
# (against the exact integer trace). Oracle HUGEINT headroom: the
# squaring rounds are scale-normalized (entries <= 1e11 regardless
# of n); the two n-dependent terms are the Rayleigh numerator
# (<= d^2 * 2*n^2*q_max^2 * SCALE^2 ~ 3e27 * n^2, inside int128 to
# n ~ 2.4e5 vectors) and the lambda denominator n^2 * 2^40 — which
# must be promoted to HUGEINT *before* the first multiply (the bare
# `nn.n * nn.n` product is BIGINT-typed in DuckDB and overflows at
# n ~ 2,899; caught by the round-10 advisor at sf0.1 n=2000). The
# Spark side carries Python ints (unbounded), and the production
# eigensolve is fit_pca regardless.
# ---------------------------------------------------------------------------

_PCA_SQUARINGS = 10
_PCA_MS = 100_000_000_000  # matrix scale: 64 * (1e11)^2 * 1e11 < HUGEINT


def _pca_square_ctes(rounds: int) -> str:
    parts = []
    for t in range(1, rounds + 1):
        parts.append(
            f""", p{t} AS MATERIALIZED (
      SELECT a.i AS i, b.j AS j, SUM(a.c * b.c) AS c
      FROM m{t - 1} a JOIN m{t - 1} b ON a.j = b.i GROUP BY 1, 2
    ), x{t} AS MATERIALIZED (
      SELECT MAX(ABS(c)) AS m FROM p{t}
    ), m{t} AS MATERIALIZED (
      SELECT i, j,
             CASE WHEN x.m = 0 THEN c
                  ELSE (ABS(c) * {_PCA_MS} // x.m)
                       * (CASE WHEN c < 0 THEN -1 ELSE 1 END)
             END AS c
      FROM p{t}, x{t} x
    )"""
        )
    return "".join(parts)


# shared prefix: exact integer scatter matrix + the unrolled rounds
_PCA_CHAIN_SQL = f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))
               AS qv
      FROM embeddings
    ), ex AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(qv, 1) - 1 AS i, unnest(qv) AS qi
      FROM q
    ), g AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             SUM(CAST(a.qi AS HUGEINT) * b.qi) AS s_ij
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), mom AS MATERIALIZED (
      SELECT i, SUM(CAST(qi AS HUGEINT)) AS s, COUNT(*) AS n FROM ex GROUP BY i
    ), cm AS MATERIALIZED (
      SELECT g.i AS i, g.j AS j, mi.n * g.s_ij - mi.s * mj.s AS c
      FROM g JOIN mom mi ON g.i = mi.i JOIN mom mj ON g.j = mj.i
      UNION ALL
      SELECT g.j, g.i, mi.n * g.s_ij - mi.s * mj.s
      FROM g JOIN mom mi ON g.i = mi.i JOIN mom mj ON g.j = mj.i
      WHERE g.i < g.j
    ), nn AS (
      SELECT MAX(n) AS n FROM mom
    ), x0 AS (
      SELECT MAX(ABS(c)) AS m FROM cm
    ), m0 AS MATERIALIZED (
      SELECT i, j,
             CASE WHEN x.m = 0 THEN c
                  ELSE (ABS(c) * {_PCA_MS} // x.m)
                       * (CASE WHEN c < 0 THEN -1 ELSE 1 END)
             END AS c
      FROM cm, x0 x
    ){_pca_square_ctes(_PCA_SQUARINGS)}, wv AS MATERIALIZED (
      SELECT i, SUM(c) AS w FROM m{_PCA_SQUARINGS} GROUP BY i
    ), mw AS (
      SELECT MAX(ABS(w)) AS m FROM wv
    ), vf AS MATERIALIZED (
      SELECT i,
             CASE WHEN mw.m = 0 THEN CAST(1000000 AS HUGEINT)
                  ELSE (ABS(w) * 1000000 // mw.m)
                       * (CASE WHEN w < 0 THEN -1 ELSE 1 END)
             END AS v
      FROM wv, mw
    )"""


@register(
    "q_pca_power",
    _PCA_CHAIN_SQL
    + """
    , rq AS (
      SELECT SUM(va.v * cm.c * vb.v) AS num
      FROM cm JOIN vf va ON cm.i = va.i
              JOIN vf vb ON cm.j = vb.i
    ), dn AS (
      SELECT SUM(v * v) AS den FROM vf
    ), tr AS (
      SELECT SUM(c) AS t FROM cm WHERE i = j
    ), qq AS (
      SELECT num // den AS q FROM rq, dn
    )
    SELECT CAST(vt.i AS BIGINT) AS i, CAST(vt.v AS BIGINT) AS v,
           CAST(qq.q * 1000000
                // (CAST(nn.n AS HUGEINT) * nn.n * 1099511627776)
             AS BIGINT)
             AS lambda_micros,
           CAST(CASE WHEN tr.t > 0 THEN qq.q * 1000000 // tr.t ELSE 0 END
             AS BIGINT) AS explained_frac_micros
    FROM vf vt, qq, tr, nn
    """,
)
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.pca import power_pca_int

    e = load_table(spark, sf_dir, "embeddings")
    v, lam, frac, d = power_pca_int(e, "embedding", squarings=_PCA_SQUARINGS)
    return spark.createDataFrame(
        [(i, v[i], lam, frac) for i in range(d)],
        "i bigint, v bigint, lambda_micros bigint, "
        "explained_frac_micros bigint",
    )


# ---------------------------------------------------------------------------
# Project the corpus onto the power-iteration axis — the distributed
# half of the PCA round trip. The learned axis travels as a constant-
# folded integer literal into one scan-stage zip_with/aggregate dot
# per row (no UDF, no shuffle, no join); products stay in BIGINT
# (|qv| < 2^20, |v| <= 10^6, d = 64 => |proj| < 2^46). The oracle
# replays the full chain and takes the same dot with
# list_inner_product — every partial is an integer below 2^53, so
# the float accumulation is exact in any order (the r10
# q_dedup_embed idiom).
# ---------------------------------------------------------------------------
@register(
    "q_pca_project_power",
    _PCA_CHAIN_SQL
    + """
    , vl AS (
      SELECT list(CAST(v AS DOUBLE) ORDER BY i) AS vl FROM vf
    )
    SELECT q.vec_id,
           CAST(list_inner_product(
             list_transform(q.qv, x -> CAST(x AS DOUBLE)), vl.vl)
             AS BIGINT) AS proj
    FROM q, vl
    """,
)
def q_pca_project_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.functions.vectors import to_fixed
    from frames_spark.similarity.pca import power_pca_int

    e = load_table(spark, sf_dir, "embeddings")
    v, _lam, _frac, _d = power_pca_int(
        e, "embedding", squarings=_PCA_SQUARINGS
    )
    lit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    dot = F.aggregate(
        F.zip_with(
            to_fixed(F.col("embedding")), lit, lambda x, a: x * a
        ),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )
    return e.select("vec_id", dot.alias("proj"))


# ---------------------------------------------------------------------------
# Hard-negative mining (FaceNet-style, Schroff et al. 2015) — per
# anchor, the k most-similar DIFFERENT-label vectors: the standard
# prep step before contrastive / retrieval-embedding training.
# Candidates come from the multi-table hyperplane LSH shared
# sign-array pass (similarity/negatives.py — never all-pairs; the
# label test runs inside the bucket expansion so same-label pairs
# never reach the cosine), exact fixed-point cosine once per deduped
# directed pair, top-k per anchor by one anchor-partitioned window.
# The oracle replays the md5 plane signs, the max_bucket guard, the
# label filter and the ROW_NUMBER ranking bit-for-bit (the
# q_dedup_embed oracle pattern + list_inner_product dots).
# ---------------------------------------------------------------------------

_HN_PLANES = 4
_HN_TABLES = 8
_HN_MAXB = 4000
_HN_K = 3


def _mined_oracle(label_op: str, order: str, k: int) -> str:
    """Self-contained SELECT (anchor_id, cand_id, cosine, rank) —
    the oracle twin of similarity/negatives.py's _mined_topk_lsh:
    ``label_op`` '!=' + order DESC mines hardest negatives, '=' +
    ASC mines hardest positives. Usable as a derived table (nested
    WITH — the established DuckDB idiom)."""
    return f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    lab AS (SELECT vec_id, label FROM embeddings),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(_HN_PLANES * _HN_TABLES)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    banded AS (
      SELECT vec_id, p // {_HN_PLANES} AS tbl,
             string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id, p // {_HN_PLANES}
    ),
    ok_buckets AS (
      SELECT tbl, bucket FROM banded
      GROUP BY tbl, bucket HAVING COUNT(*) BETWEEN 2 AND {_HN_MAXB}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS cand_id
      FROM banded a
      JOIN ok_buckets ob ON a.tbl = ob.tbl AND a.bucket = ob.bucket
      JOIN banded b ON b.tbl = a.tbl AND b.bucket = a.bucket
                   AND a.vec_id != b.vec_id
      JOIN lab la ON la.vec_id = a.vec_id
      JOIN lab lb ON lb.vec_id = b.vec_id
      WHERE la.label {label_op} lb.label
    ),
    vecs AS MATERIALIZED (
      SELECT vec_id, list(e ORDER BY i) AS v, SUM(e * e) AS n2
      FROM fixed GROUP BY vec_id
    ),
    cos AS (
      SELECT anchor_id, cand_id,
             CAST(list_inner_product(a.v, b.v) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
               AS cosine
      FROM cand JOIN vecs a ON a.vec_id = anchor_id
                JOIN vecs b ON b.vec_id = cand_id
    ),
    ranked AS (
      SELECT anchor_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine {order}, cand_id) AS rank
      FROM cos
    )
    SELECT anchor_id, cand_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@register(
    "q_hard_negatives",
    f"""
    SELECT anchor_id, cand_id AS neg_id, cosine, rank
    FROM ({_mined_oracle("!=", "DESC", _HN_K)}) t
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.negatives import hard_negatives_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives_lsh(
        emb,
        "vec_id",
        "embedding",
        "label",
        k=_HN_K,
        num_planes=_HN_PLANES,
        num_tables=_HN_TABLES,
        max_bucket=_HN_MAXB,
    )


# ---------------------------------------------------------------------------
# Triplet mining — the full FaceNet prep artifact: per anchor, the
# hardest POSITIVE (least-similar same-label bucket mate — the pair
# the embedding must pull together) joined with the hardest NEGATIVE
# (most-similar different-label — the pair it must push apart), plus
# the margin a triplet loss would see and whether it is violated at
# alpha = 0.2. Anchors appear iff both a positive and a negative
# exist among their bucket mates (inner join, mirrored). Both sides
# ride the same shared-sign-array LSH pass; the margin quantizes the
# difference of two bit-identical doubles, so it is engine-exact.
# ---------------------------------------------------------------------------
@register(
    "q_triplet_mining",
    f"""
    WITH j AS (
      SELECT p.anchor_id,
             p.cand_id AS pos_id, p.cosine AS pos_cosine,
             n.cand_id AS neg_id, n.cosine AS neg_cosine,
             CAST(FLOOR((p.cosine - n.cosine) * 1000000 + 0.5) AS BIGINT)
               AS margin_micros
      FROM ({_mined_oracle("=", "ASC", 1)}) p
      JOIN ({_mined_oracle("!=", "DESC", 1)}) n
        ON p.anchor_id = n.anchor_id
    )
    SELECT anchor_id, pos_id, pos_cosine, neg_id, neg_cosine,
           margin_micros, margin_micros < 200000 AS violated
    FROM j
    """,
)
def q_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.negatives import mine_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    triplets = mine_triplets(
        emb,
        "vec_id",
        "embedding",
        "label",
        k=1,
        num_planes=_HN_PLANES,
        num_tables=_HN_TABLES,
        max_bucket=_HN_MAXB,
    )
    from frames_spark.operators.caching import retie

    margin = F.floor(
        (F.col("pos_cosine") - F.col("neg_cosine")) * 1000000 + F.lit(0.5)
    ).cast("long")
    return retie(
        triplets
        .withColumn("margin_micros", margin)
        .select(
            "anchor_id",
            "pos_id",
            "pos_cosine",
            "neg_id",
            "neg_cosine",
            "margin_micros",
            (F.col("margin_micros") < 200000).alias("violated"),
        ),
        triplets,
    )


# ---------------------------------------------------------------------------
# GOVERNED-GEOMETRY twins (r12 verdict #2): num_planes derived from a
# one-aggregate corpus-size pre-flight via suggest_num_planes instead
# of the pinned _HN_PLANES — the sf1 evidence showed the pinned 4-plane
# geometry is the suite's one super-linear scaler (bucket sizes grow
# linearly with the corpus under a fixed plane count; the governor
# holds expected bucket size at max_bucket/4). The oracle replays the
# governor IN SQL over the same corpus count (the q_dedup_ngram_auto
# gov-CTE pattern), interpolating the SAME constants the library
# defaults to (DEFAULT_MIN/MAX_PLANES), so the derived plane count is
# value-certified cross-engine at whatever SF the sweep runs: at the
# 500/2000-vector tiers the governor sits at the 4-plane floor (same
# result set as the pinned twins), at sf1's 20k vectors it derives 5.
# ---------------------------------------------------------------------------

# VALUES plane-table headroom: 12 planes/table covers corpora to ~2M
# vectors (np > 12 needs n >> 11 > max_bucket/4). Past that the gov
# CTE raises via error() instead of silently banding with truncated
# plane rows.
_HN_ORACLE_MAX_PLANES = 12


def _gov_banded_ctes() -> str:
    """The governed banding CTE prefix shared by the *_auto miner
    oracles: gov replays suggest_num_planes via the shared
    _gov_np_sql builder (q01_core_ops) over COUNT(*) of the same
    corpus the Spark side pre-flights; signs/banded use only the
    first np planes per table out of the 12-plane VALUES headroom."""
    return f"""
    fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    lab AS (SELECT vec_id, label FROM embeddings),
    gov AS {_gov_np_sql("SELECT COUNT(*) FROM embeddings", _HN_MAXB, _HN_ORACLE_MAX_PLANES)},
    planes(p, i, c) AS (VALUES {_lsh_planes_values(_HN_TABLES * _HN_ORACLE_MAX_PLANES)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      WHERE p < {_HN_TABLES} * (SELECT np FROM gov)
      GROUP BY vec_id, p
    ),
    banded AS (
      SELECT vec_id, p // (SELECT np FROM gov) AS tbl,
             string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id, p // (SELECT np FROM gov)
    ),
    ok_buckets AS (
      SELECT tbl, bucket FROM banded
      GROUP BY tbl, bucket HAVING COUNT(*) BETWEEN 2 AND {_HN_MAXB}
    )"""


@register(
    "q_hard_negatives_auto",
    f"""
    WITH {_gov_banded_ctes()},
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS cand_id
      FROM banded a
      JOIN ok_buckets ob ON a.tbl = ob.tbl AND a.bucket = ob.bucket
      JOIN banded b ON b.tbl = a.tbl AND b.bucket = a.bucket
                   AND a.vec_id != b.vec_id
      JOIN lab la ON la.vec_id = a.vec_id
      JOIN lab lb ON lb.vec_id = b.vec_id
      WHERE la.label != lb.label
    ),
    vecs AS MATERIALIZED (
      SELECT vec_id, list(e ORDER BY i) AS v, SUM(e * e) AS n2
      FROM fixed GROUP BY vec_id
    ),
    cos AS (
      SELECT anchor_id, cand_id,
             CAST(list_inner_product(a.v, b.v) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
               AS cosine
      FROM cand JOIN vecs a ON a.vec_id = anchor_id
                JOIN vecs b ON b.vec_id = cand_id
    ),
    ranked AS (
      SELECT anchor_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM cos
    )
    SELECT anchor_id, cand_id AS neg_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_HN_K}
    """,
)
def q_hard_negatives_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.similarity.negatives import hard_negatives_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    # num_planes omitted -> the suggest_num_planes governor over a
    # one-aggregate pre-flight; everything else matches the pinned twin
    return hard_negatives_lsh(
        emb,
        "vec_id",
        "embedding",
        "label",
        k=_HN_K,
        num_tables=_HN_TABLES,
        max_bucket=_HN_MAXB,
    )


@register(
    "q_triplet_mining_auto",
    f"""
    WITH {_gov_banded_ctes()},
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS cand_id,
             la.label = lb.label AS same_lbl
      FROM banded a
      JOIN ok_buckets ob ON a.tbl = ob.tbl AND a.bucket = ob.bucket
      JOIN banded b ON b.tbl = a.tbl AND b.bucket = a.bucket
                   AND a.vec_id != b.vec_id
      JOIN lab la ON la.vec_id = a.vec_id
      JOIN lab lb ON lb.vec_id = b.vec_id
    ),
    vecs AS MATERIALIZED (
      SELECT vec_id, list(e ORDER BY i) AS v, SUM(e * e) AS n2
      FROM fixed GROUP BY vec_id
    ),
    cos AS (
      SELECT anchor_id, cand_id, same_lbl,
             CAST(list_inner_product(a.v, b.v) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
               AS cosine
      FROM cand JOIN vecs a ON a.vec_id = anchor_id
                JOIN vecs b ON b.vec_id = cand_id
    ),
    pos AS (
      SELECT anchor_id, cand_id AS pos_id, cosine AS pos_cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine ASC, cand_id) AS r
      FROM cos WHERE same_lbl
    ),
    neg AS (
      SELECT anchor_id, cand_id AS neg_id, cosine AS neg_cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, cand_id) AS r
      FROM cos WHERE NOT same_lbl
    ),
    j AS (
      SELECT anchor_id, pos_id, pos_cosine, neg_id, neg_cosine,
             CAST(FLOOR((pos_cosine - neg_cosine) * 1000000 + 0.5) AS BIGINT)
               AS margin_micros
      FROM pos JOIN neg USING (anchor_id)
      WHERE pos.r = 1 AND neg.r = 1
    )
    SELECT anchor_id, pos_id, pos_cosine, neg_id, neg_cosine,
           margin_micros, margin_micros < 200000 AS violated
    FROM j
    """,
)
def q_triplet_mining_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.operators.caching import retie
    from frames_spark.similarity.negatives import mine_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    triplets = mine_triplets(
        emb,
        "vec_id",
        "embedding",
        "label",
        k=1,
        num_tables=_HN_TABLES,
        max_bucket=_HN_MAXB,
    )
    margin = F.floor(
        (F.col("pos_cosine") - F.col("neg_cosine")) * 1000000 + F.lit(0.5)
    ).cast("long")
    return retie(
        triplets
        .withColumn("margin_micros", margin)
        .select(
            "anchor_id",
            "pos_id",
            "pos_cosine",
            "neg_id",
            "neg_cosine",
            "margin_micros",
            (F.col("margin_micros") < 200000).alias("violated"),
        ),
        triplets,
    )


# ---------------------------------------------------------------------------
# Sign-projection LSH bucket pre-flight — the probe-cost audit for
# the embedding-LSH family (q_dedup_embed*, hard negatives, triplet
# mining), symmetric with q_lsh_bucket_stats (MinHash bands) and
# q_ivf_cell_stats (IVF cells): per table, the bucket-size histogram
# and the directed candidate-pair count it implies. This is the
# number you read BEFORE running a miner at scale — n_pairs per
# table ~ probe cost, and a size spike reveals a degenerate
# signature (near-zero or boilerplate vectors) the max_bucket guard
# would drop. One light pass (vid, tbl, bucket), two aggregates.
# ---------------------------------------------------------------------------
@register(
    "q_embed_bucket_stats",
    f"""
    WITH fixed AS ({_FIXED_SQL.format(corpus="SELECT vec_id, embedding FROM embeddings")}),
    planes(p, i, c) AS (VALUES {_lsh_planes_values(_HN_PLANES * _HN_TABLES)}),
    signs AS (
      SELECT vec_id, p,
             CASE WHEN SUM(e * c) >= 0 THEN '1' ELSE '0' END AS sign
      FROM fixed JOIN planes USING (i)
      GROUP BY vec_id, p
    ),
    banded AS (
      SELECT vec_id, p // {_HN_PLANES} AS tbl,
             string_agg(sign, '' ORDER BY p) AS bucket
      FROM signs GROUP BY vec_id, p // {_HN_PLANES}
    ),
    sizes AS (
      SELECT tbl, bucket, COUNT(*) AS s FROM banded GROUP BY tbl, bucket
    ),
    hist AS (
      SELECT tbl, s, COUNT(*) AS n_buckets,
             COUNT(*) * s * (s - 1) AS pairs
      FROM sizes GROUP BY tbl, s
    )
    SELECT CAST(tbl AS BIGINT) AS tbl,
           CAST(s AS BIGINT) AS bucket_size,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(pairs AS BIGINT) AS n_directed_pairs,
           CAST(CASE WHEN SUM(pairs) OVER (PARTITION BY tbl) = 0 THEN 0
                ELSE SUM(CASE WHEN s > {_HN_MAXB} THEN pairs ELSE 0 END)
                       OVER (PARTITION BY tbl)
                     * 1000000 // SUM(pairs) OVER (PARTITION BY tbl)
                END AS BIGINT) AS dropped_mass_ppm
    FROM hist
    """,
)
def q_embed_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frames_spark.dedup.embedding import _fixed, table_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    fixed = _fixed(emb, "vec_id", "embedding")
    tables = table_buckets(_HN_TABLES, _HN_PLANES, 64)
    banded = fixed.select("vid", F.explode(tables).alias("b")).select(
        "vid",
        F.col("b.tbl").cast("long").alias("tbl"),
        F.col("b.bucket").alias("bucket"),
    )
    sizes = banded.groupBy("tbl", "bucket").agg(
        F.count(F.lit(1)).alias("s")
    )
    hist = sizes.groupBy("tbl", "s").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (F.count(F.lit(1)) * F.col("s") * (F.col("s") - 1))
        .cast("long")
        .alias("n_directed_pairs"),
    )
    # dropped_mass_ppm: the share of each table's directed-pair mass
    # sitting in buckets the _HN_MAXB guard skips — the audit column
    # for the miner's silent-empty failure mode (r10 verdict #1).
    # Integer ppm (BIGINT-safe to ~3e6 vectors/table: pairs*1e6 <
    # 2^63); a nonzero value means the mining configuration is
    # dropping candidates and num_planes needs raising.
    from pyspark.sql import Window

    w = Window.partitionBy("tbl")
    tot = F.sum("n_directed_pairs").over(w)
    drop = F.sum(
        F.when(F.col("s") > _HN_MAXB, F.col("n_directed_pairs")).otherwise(
            F.lit(0)
        )
    ).over(w)
    return (
        hist.select(
            "tbl",
            F.col("s").cast("long").alias("bucket_size"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            "n_directed_pairs",
            tot.alias("_tot"),
            drop.alias("_drop"),
        )
        .withColumn(
            "dropped_mass_ppm",
            F.when(F.col("_tot") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("(_drop * 1000000) div _tot")
            ),
        )
        .drop("_tot", "_drop")
    )

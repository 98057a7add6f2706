"""Round-4 query additions: new-vs-returning users, Gopher quality
gate, exact embedding covariance, mergeable histogram quantiles.

Value pins run at sf0.001 against independently computed expectations
(duckdb or numpy); plan shape is covered by test_plan_hygiene's
blanket sweep plus the targeted assertions here.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from frames_spark.queries import QUERIES


def test_new_vs_returning_matches_duckdb(spark, sf_dir):
    got = {
        r["day"]: (r["new_users"], r["returning_users"])
        for r in QUERIES["q_new_vs_returning"](spark, sf_dir).collect()
    }
    exp = duckdb.sql(
        f"""
        WITH ud AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
          FROM read_parquet('{sf_dir}/events.parquet')
        ), fs AS (SELECT user_id, MIN(day) AS fd FROM ud GROUP BY 1)
        SELECT day, SUM(CASE WHEN day = fd THEN 1 ELSE 0 END),
               SUM(CASE WHEN day > fd THEN 1 ELSE 0 END)
        FROM ud JOIN fs USING (user_id) GROUP BY day
        """
    ).fetchall()
    assert len(got) == len(exp) > 0
    for day, new, ret in exp:
        assert got[day] == (new, ret)
    # day 1: every active user is new by construction
    first_day = min(got)
    assert got[first_day][1] == 0


def test_new_vs_returning_sum_is_dau(spark, sf_dir):
    rows = QUERIES["q_new_vs_returning"](spark, sf_dir).collect()
    dau = {
        r["day"]: r["dau"]
        for r in duckdb.sql(
            f"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       COUNT(DISTINCT user_id) AS dau
                FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"""
        )
        .df()
        .to_dict("records")
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == dau[r["day"]]


def test_gopher_quality_rules(spark, sf_dir):
    rows = QUERIES["q_gopher_quality"](spark, sf_dir).collect()
    assert len(rows) > 0
    n_pass = sum(1 for r in rows if r["passes"])
    # the gate must discriminate, not rubber-stamp
    assert 0 < n_pass < len(rows)
    for r in rows:
        expect = (
            25 <= r["n_words"] <= 100000
            and 3_000_000 <= r["mean_word_len_micros"] <= 10_000_000
            and r["alpha_frac_micros"] >= 800_000
        )
        assert r["passes"] == expect, r


def test_embed_covariance_vs_numpy(spark, sf_dir):
    rows = QUERIES["q_embed_covariance"](spark, sf_dir).collect()
    vecs = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    fp = 1 << 20
    x = np.floor(
        np.array([v[0] for v in vecs], dtype=np.float64) * fp + 0.5
    )
    n, d = x.shape
    assert len(rows) == d * (d + 1) // 2
    # population covariance of the quantized values, exact integers
    got = {(r["i"], r["j"]): r["cov"] for r in rows}
    s = x.sum(axis=0)
    for i in range(0, d, 7):
        for j in range(i, d, 11):
            s_ij = float(np.dot(x[:, i], x[:, j]))
            exp = (n * s_ij - s[i] * s[j]) / n / n / fp / fp
            assert got[(i, j)] == pytest.approx(exp, rel=1e-9), (i, j)


def test_embed_covariance_plan_no_self_join(spark, sf_dir):
    """The corpus must be read, expanded and partially aggregated in
    one pass — a SortMergeJoin of the embeddings table against itself
    would be the O(n*d^2)-shuffle plan this query exists to avoid
    (the only joins are the two 64-row broadcast moment joins)."""
    from frames_spark.plans.explain import formatted_plan

    plan = formatted_plan(QUERIES["q_embed_covariance"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    # partial aggregation collapses the expansion before the exchange
    assert "HashAggregate" in plan


def test_hist_quantiles_bounds(spark, sf_dir):
    rows = {
        r["p"]: r for r in QUERIES["q_hist_quantiles"](spark, sf_dir).collect()
    }
    assert set(rows) == {0.25, 0.5, 0.75, 0.9, 0.99}
    exact = duckdb.sql(
        f"""SELECT quantile_disc(o_totalprice, [0.25, 0.5, 0.75, 0.9, 0.99])
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchone()[0]
    width = 100_000_000  # bin width in micros
    for p, ex in zip((0.25, 0.5, 0.75, 0.9, 0.99), exact):
        lo = rows[p]["est_lo_micros"]
        # estimate is the true quantile's bin lower bound
        assert lo <= ex * 1e6 < lo + width, (p, lo, ex)
    # estimates are monotone in p
    est = [rows[p]["est_lo_micros"] for p in (0.25, 0.5, 0.75, 0.9, 0.99)]
    assert est == sorted(est)


def test_hist_quantiles_parts_merge(spark, sf_dir):
    """The mergeability contract: quantiles from per-day parts over a
    date SUBRANGE equal quantiles computed directly on that subrange —
    parts are the stored artifact, the fact table is never re-read."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cutoff = o.agg(F.max("o_orderdate")).collect()[0][0]
    half = o.filter(F.col("o_orderdate") <= F.lit(cutoff) - F.expr("INTERVAL 400 DAYS"))
    micros = F.floor(F.col("o_totalprice") * 1_000_000 + 0.5).cast("long")
    parts = half.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day"),
        (micros / 100_000_000).cast("long").alias("bin"),
    ).count()
    merged = parts.groupBy("bin").agg(F.sum("count").alias("cnt"))
    cum = merged.select(
        "bin",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    est = (
        cum.filter(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")))
        .agg(F.min("bin"))
        .collect()[0][0]
    )
    exact = duckdb.sql(
        f"""SELECT quantile_disc(o_totalprice, 0.5)
            FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE o_orderdate <= (
              SELECT max(o_orderdate) - INTERVAL 400 DAY
              FROM read_parquet('{sf_dir}/orders.parquet'))"""
    ).fetchone()[0]
    assert est * 100_000_000 <= exact * 1e6 < (est + 1) * 100_000_000


def test_heavy_hitters_exact_under_any_layout(spark, sf_dir):
    """The determinism contract: MG prunes, the recount decides — the
    result equals the exact phi-heavy set no matter how the token
    stream is partitioned."""
    import pyspark.sql.functions as F

    from frames_spark.functions import text as text_fns
    from frames_spark.operators.sketches import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
    exact = duckdb.sql(
        f"""WITH t AS (
              SELECT unnest(string_split(trim(regexp_replace(lower(text),
                '\\s+', ' ', 'g')), ' ')) AS tok
              FROM read_parquet('{sf_dir}/documents.parquet'))
            SELECT tok, COUNT(*) FROM t GROUP BY tok
            HAVING COUNT(*) >= ceil(0.02 * (SELECT COUNT(*) FROM t))"""
    ).fetchall()
    expect = {(t, c) for t, c in exact}
    for layout in (toks.repartition(1), toks.repartition(13, "tok"), toks):
        got = {
            (r["tok"], r["cnt"])
            for r in heavy_hitters(layout, "tok", phi=0.02, m=256).collect()
        }
        assert got == expect


def test_heavy_hitters_rejects_undersized_m(spark):
    from frames_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], ["tok"])
    with pytest.raises(ValueError, match="needs m"):
        heavy_hitters(df, "tok", phi=0.001, m=256)


def test_mg_candidates_superset(spark, sf_dir):
    """Per-partition MG summaries must contain every global heavy
    hitter even on an adversarial single-partition layout."""
    import pyspark.sql.functions as F

    from frames_spark.functions import text as text_fns
    from frames_spark.operators.sketches import mg_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
    n = toks.count()
    exact_hh = {
        r["tok"]
        for r in toks.groupBy("tok").count().filter(F.col("count") > n / 257).collect()
    }
    cands = {
        r["tok"] for r in mg_candidates(toks.repartition(1), "tok", 256).collect()
    }
    assert exact_hh <= cands


def test_bm25_scoring_properties(spark, sf_dir):
    rows = QUERIES["q_bm25"](spark, sf_dir).collect()
    assert rows and all(r["score_micros"] > 0 for r in rows)
    # a document that mentions no query term must be absent
    import pyspark.sql.functions as F

    from frames_spark.functions import text as text_fns

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_terms = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", text_fns.tokens(F.col("text")).alias("t")
        )
        .filter(F.arrays_overlap("t", F.array(F.lit("spark"), F.lit("query"), F.lit("join"))))
        .collect()
    }
    assert {r["doc_id"] for r in rows} == with_terms


def test_key_skew_values(spark, sf_dir):
    r = QUERIES["q_key_skew"](spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert r["n_rows"] == li.count()
    assert r["n_keys"] == li.select("l_orderkey").distinct().count()
    assert r["max_key_rows"] >= r["n_rows"] / r["n_keys"]
    # skew factor is max/avg, >= 1 by construction
    assert r["skew_factor_micros"] >= 1_000_000


def test_group_median_two_phase_plan(spark, sf_dir):
    """The grouped median must ride the two-phase distributed rank —
    a 5-value PARTITION BY window over the fact table caps the sort
    at 5 tasks at any cluster size. The rank's partition-id column
    appears either as the live spark_partition_id() expression
    (unstaged path) or as the staged _pid column read back off the
    auto-stage localCheckpoint (join-fed inputs stage by default
    since round 5 — see operators/ranking.py _auto_stage)."""
    from frames_spark.plans.explain import formatted_plan

    plan = formatted_plan(QUERIES["q_group_median_scalable"](spark, sf_dir))
    staged = "_pid#" in plan and "localCheckpoint" in plan
    assert "spark_partition_id" in plan.lower() or staged


def test_group_median_matches_duckdb(spark, sf_dir):
    got = {
        r["c_mktsegment"]: r["median_price"]
        for r in QUERIES["q_group_median_scalable"](spark, sf_dir).collect()
    }
    exp = dict(
        duckdb.sql(
            f"""WITH r AS (
              SELECT c_mktsegment, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT),
                                o_orderkey) AS rn,
                     COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
              FROM read_parquet('{sf_dir}/orders.parquet') o
              JOIN read_parquet('{sf_dir}/customer.parquet') c
                ON o_custkey = c_custkey)
            SELECT c_mktsegment, o_totalprice FROM r WHERE rn = ceil(n / 2.0)"""
        ).fetchall()
    )
    assert got == exp


def test_churn_bounded_by_active(spark, sf_dir):
    rows = QUERIES["q_churn"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_churned"] <= r["n_active"]


def test_stickiness_in_unit_interval(spark, sf_dir):
    rows = QUERIES["q_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # mean DAU can't exceed WAU (every daily user is a weekly user)
        assert 0 < r["stickiness_micros"] <= 1_000_000
        assert r["wau"] >= r["sum_dau"] / r["n_days"]


def test_rolling_median_window_semantics(spark, sf_dir):
    rows = sorted(
        QUERIES["q_rolling_median"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    revs = [r["rev_micros"] for r in rows]
    import math

    for k, r in enumerate(rows):
        window = sorted(revs[max(0, k - 6) : k + 1])
        assert r["med7_micros"] == window[math.ceil(len(window) / 2) - 1]


def test_join_cardinality_matches_actual_join(spark, sf_dir):
    r = QUERIES["q_join_cardinality_est"](spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    actual = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert r["join_rows"] == actual


def test_triangle_count_degree_ordered_vs_naive(spark, sf_dir):
    """Degree-ordered closure must equal a naive all-orientations
    count computed independently in duckdb."""
    got = QUERIES["q_triangle_count"](spark, sf_dir).collect()[0][
        "n_triangles"
    ]
    exp = duckdb.sql(
        f"""
        WITH e AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                 GREATEST(a.l_partkey, b.l_partkey) AS v
          FROM read_parquet('{sf_dir}/lineitem.parquet') a
          JOIN read_parquet('{sf_dir}/lineitem.parquet') b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        )
        SELECT COUNT(*) FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """
    ).fetchone()[0]
    assert got == exp > 0


def test_equifreq_bins_balanced(spark, sf_dir):
    import collections

    rows = QUERIES["q_equifreq_bins"](spark, sf_dir).collect()
    sizes = collections.Counter(r["bin"] for r in rows)
    assert set(sizes) == set(range(1, 11))
    # equal frequency within 1 row
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # bins are ordered by value: every bin-k value <= every bin-k+1 value
    hi = {b: max(r["o_totalprice"] for r in rows if r["bin"] == b) for b in sizes}
    lo = {b: min(r["o_totalprice"] for r in rows if r["bin"] == b) for b in sizes}
    for b in range(1, 10):
        assert hi[b] <= lo[b + 1] + 1e-9


def test_target_encoding_loo_excludes_self(spark, sf_dir):
    rows = QUERIES["q_target_encoding"](spark, sf_dir).collect()
    import collections

    by_cat = collections.defaultdict(list)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    price = {r["o_orderkey"]: r["o_totalprice"] for r in o}
    for r in o:
        by_cat[r["o_orderpriority"]].append(r["o_orderkey"])
    for r in rows[:200]:
        keys = by_cat[r["o_orderpriority"]]
        others = [price[k] for k in keys if k != r["o_orderkey"]]
        assert r["loo_mean_price"] == pytest.approx(
            sum(others) / len(others), rel=1e-6
        )


def test_lang_confusion_diagonal_and_rates(spark, sf_dir):
    rows = QUERIES["q_lang_confusion"](spark, sf_dir).collect()
    assert rows
    import collections

    by_actual = collections.defaultdict(int)
    for r in rows:
        by_actual[r["actual"]] += r["rate_micros"]
    # row rates sum to ~1 per actual language (rounding at micros)
    for actual, total in by_actual.items():
        assert abs(total - 1_000_000) <= len(rows), actual


def test_abtest_arms_partition_users(spark, sf_dir):
    r = QUERIES["q_abtest_lift"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    assert 0 <= r["c_a"] <= r["n_a"] and 0 <= r["c_b"] <= r["n_b"]


def test_minhash_calibration_monotone_exact(spark, sf_dir):
    """Higher estimate buckets must carry higher mean exact Jaccard —
    the property that makes an LSH threshold meaningful at all."""
    rows = sorted(
        QUERIES["q_minhash_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    exact = [r["mean_exact"] for r in rows]
    assert exact == sorted(exact)
    for r in rows:
        assert 0.0 <= r["mean_exact"] <= 1.0
        assert r["bucket"] / 10 <= r["mean_est"] <= (r["bucket"] + 1) / 10


def test_degree_dist_conservation(spark, sf_dir):
    rows = QUERIES["q_degree_dist"](spark, sf_dir).collect()
    # sum(degree * n_nodes) = 2 |E| (handshake lemma)
    total = sum(r["degree"] * r["n_nodes"] for r in rows)
    assert total % 2 == 0 and total > 0


def test_pmi_symmetric_and_bounded(spark, sf_dir):
    rows = QUERIES["q_cooccurrence_pmi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # canonical pair order
        assert r["n_ab"] > 0


def test_histogram_2d_conserves_rows(spark, sf_dir):
    rows = QUERIES["q_histogram_2d"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["n"] for r in rows) == li.count()


def test_ltv_cohort_totals(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = QUERIES["q_ltv_cohort"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")))
        .collect()[0][0]
    )
    assert sum(r["revenue_micros"] for r in rows) == total
    assert all(r["weeks_since"] >= 0 for r in rows)


def test_segment_migration_matrix(spark, sf_dir):
    rows = QUERIES["q_segment_migration"](spark, sf_dir).collect()
    froms = {r["from_lvl"] for r in rows}
    tos = {r["to_lvl"] for r in rows}
    assert froms <= {"heavy", "light"} and len(froms) == 2
    assert tos <= {"heavy", "light", "churn"}
    # total transitions = active user-weeks excluding the last week
    import pyspark.sql.functions as F

    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    last = uw.agg(F.max("wk")).collect()[0][0]
    expected = uw.filter(F.col("wk") < F.lit(last)).count()
    assert sum(r["n"] for r in rows) == expected


def test_revenue_split_sums_to_total(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = QUERIES["q_revenue_new_vs_returning"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")))
        .collect()[0][0]
    )
    assert (
        sum(r["new_rev_micros"] + r["returning_rev_micros"] for r in rows)
        == total
    )


def test_funnel_windowed_stage_monotone(spark, sf_dir):
    r = QUERIES["q_funnel_windowed"](spark, sf_dir).collect()[0]
    assert r["n_view_users"] >= r["n_click_users"] >= 0
    assert r["n_purchase_users"] >= 0
    # strict funnel can't beat the unconstrained first-touch funnel
    plain = {
        row["step"]: row["n_users"]
        for row in QUERIES["q_funnel_counts"](spark, sf_dir).collect()
    }
    assert r["n_view_users"] == plain["view"]
    assert r["n_click_users"] <= plain["view"]


def test_attribution_conserves_revenue(spark, sf_dir):
    """Linear attribution must conserve total purchase revenue up to
    the per-pair micro-rounding (|pairs| half-ulps at most)."""
    import pyspark.sql.functions as F

    rows = QUERIES["q_attribution"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")))
        .collect()[0][0]
    )
    credited = sum(r["credit_micros"] for r in rows)
    n_credits = sum(r["n_credits"] for r in rows)
    assert abs(credited - total) <= n_credits  # rounding slack
    assert {r["touch_type"] for r in rows} <= {
        "view", "click", "unattributed"
    }


def test_sample_estimate_brackets_truth(spark, sf_dir):
    import pyspark.sql.functions as F

    r = QUERIES["q_sample_estimate"](spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    truth = o.agg(
        F.sum(F.floor(F.col("o_totalprice") * 1_000_000 + 0.5).cast("long"))
    ).collect()[0][0]
    # 95% CI should bracket the truth (deterministic sample; allow 3x
    # slack so tiny-SF noise can't flake the test)
    assert abs(r["est_total_micros"] - truth) <= 3 * r["ci95_micros"]
    assert r["sample_n"] > 0 and r["ci95_micros"] > 0


def test_funnel_paths_cover_all_sessions(spark, sf_dir):
    rows = QUERIES["q_funnel_paths"](spark, sf_dir).collect()
    from frames_spark.operators import window as win_ops
    from frames_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_sessions = (
        win_ops.sessionize(ev, "user_id", "ts", 1800, order_tiebreak=["event_id"])
        .select("user_id", "session_id")
        .distinct()
        .count()
    )
    assert sum(r["n_sessions"] for r in rows) == n_sessions
    assert all(1 <= len(r["path"].split(">")) <= 3 for r in rows)


def test_group_quantiles_match_duckdb(spark, sf_dir):
    got = {
        (r["c_mktsegment"], r["p"]): r["price"]
        for r in QUERIES["q_group_quantiles"](spark, sf_dir).collect()
    }
    exp = {
        (seg, p): v
        for seg, p, v in duckdb.sql(
            f"""WITH r AS (
              SELECT c_mktsegment, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY CAST(FLOOR(o_totalprice*1000000+0.5) AS BIGINT),
                                o_orderkey) AS rn,
                     COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
              FROM read_parquet('{sf_dir}/orders.parquet') o
              JOIN read_parquet('{sf_dir}/customer.parquet') c
                ON o_custkey = c_custkey)
            SELECT c_mktsegment,
                   CAST(CASE WHEN rn = ceil(0.25*n) THEN 0.25
                        WHEN rn = ceil(0.5*n) THEN 0.5 ELSE 0.75 END AS DOUBLE),
                   o_totalprice
            FROM r WHERE rn IN (ceil(0.25*n), ceil(0.5*n), ceil(0.75*n))"""
        ).fetchall()
    }
    assert got == exp


def test_drift_ks_bounds(spark, sf_dir):
    r = QUERIES["q_drift_ks"](spark, sf_dir).collect()[0]
    assert 0 <= r["ks_micros"] <= 1_000_000


def test_psi_nonnegative(spark, sf_dir):
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0; micro-rounding
    # can shave at most half a micro per bin
    r = QUERIES["q_psi"](spark, sf_dir).collect()[0]
    assert r["psi_micros_sum"] >= -100


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = QUERIES["q_benford"](spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    total_share = sum(r["share_micros"] for r in rows)
    assert abs(total_share - 1_000_000) <= len(rows)
    # Benford expectations themselves sum to 1
    assert abs(sum(r["benford_micros"] for r in rows) - 1_000_000) <= len(rows)


def test_sparse_cosine_bounds_and_symmetry(spark, sf_dir):
    rows = QUERIES["q_sparse_cosine"](spark, sf_dir).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 500_000 <= r["cos_micros"] <= 1_000_001


def test_mutual_info_nonnegative(spark, sf_dir):
    # MI >= 0; nano-rounding can shave < 1 nano per cell
    r = QUERIES["q_mutual_info"](spark, sf_dir).collect()[0]
    assert r["mi_nanos_sum"] >= -100


def test_gap_fill_semantics(spark, sf_dir):
    rows = sorted(
        QUERIES["q_gap_fill"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    # spine is contiguous daily
    days = [r["day"] for r in rows]
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    )
    # observed days pass through; gaps get locf and bounded interp
    last_obs = None
    for r in rows:
        if r["rev_micros"] is not None:
            assert r["locf_micros"] == r["rev_micros"]
            assert r["interp_micros"] == r["rev_micros"]
            last_obs = r["rev_micros"]
        elif last_obs is not None:
            assert r["locf_micros"] == last_obs
    # interpolated values sit between their anchors
    for i, r in enumerate(rows):
        if r["rev_micros"] is None and r["interp_micros"] is not None:
            prev_obs = next(
                rows[j]["rev_micros"]
                for j in range(i, -1, -1)
                if rows[j]["rev_micros"] is not None
            )
            next_obs = next(
                rows[j]["rev_micros"]
                for j in range(i, len(rows))
                if rows[j]["rev_micros"] is not None
            )
            lo, hi = sorted((prev_obs, next_obs))
            assert lo - 1 <= r["interp_micros"] <= hi + 1


def test_poisson_bootstrap_replicates(spark, sf_dir):
    """Replicate means must scatter AROUND the true mean with the
    bootstrap's characteristic spread (not collapse to it, not fly
    off), and be layout-invariant by construction (hash weights)."""
    import pyspark.sql.functions as F

    rows = QUERIES["q_poisson_bootstrap"](spark, sf_dir).collect()
    assert len(rows) == 20
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    stats = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev("o_totalprice").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    se = stats["sd"] / stats["n"] ** 0.5 * 1e6
    mu = stats["mu"] * 1e6
    means = [r["mean_micros"] for r in rows]
    # every replicate within 5 standard errors; spread within [se/5, 5se]
    assert all(abs(m - mu) < 5 * se for m in means)
    spread = max(means) - min(means)
    assert se / 5 < spread < 10 * se


def test_mann_whitney_sanity(spark, sf_dir):
    r = QUERIES["q_mann_whitney"](spark, sf_dir).collect()[0]
    # U is bounded by na*nb (doubled form by 2*na*nb)
    assert 0 <= r["u2_a"] <= 2 * r["na"] * r["nb"]
    # same-distribution synthetic segments: |z| should be modest
    assert abs(r["z_micros"]) < 5_000_000


def test_corr_matrix_bounds(spark, sf_dir):
    rows = QUERIES["q_corr_matrix"](spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1_000_001 <= r["corr_micros"] <= 1_000_001
    # the synthetic columns are generated independently: every
    # pairwise correlation must be near zero (this would catch a
    # moments-mix-up bug, which typically yields |corr| ~ 1)
    assert all(abs(r["corr_micros"]) < 100_000 for r in rows)


def test_spearman_matches_scipy_free_reference(spark, sf_dir):
    """Midrank Spearman == numpy-computed reference (rankdata-style
    average ranks) on the same data."""
    import numpy as np

    r = QUERIES["q_spearman"](spark, sf_dir).collect()[0]
    li = duckdb.sql(
        f"""SELECT CAST(l_quantity AS BIGINT) x,
                   CAST(FLOOR(l_extendedprice*1000000+0.5) AS BIGINT) y
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchnumpy()
    x, y = li["x"].astype(np.int64), li["y"].astype(np.int64)

    def avg_rank(v):
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    ra, rb = avg_rank(x), avg_rank(y)
    rho = np.corrcoef(ra, rb)[0, 1]
    assert abs(r["rho_micros"] / 1e6 - rho) < 2e-6


def test_welch_ttest_sanity(spark, sf_dir):
    r = QUERIES["q_welch_ttest"](spark, sf_dir).collect()[0]
    # same-distribution synthetic segments: modest t, tiny effect
    assert abs(r["t_micros"]) < 5_000_000
    assert abs(r["cohen_d_micros"]) < 500_000
    # Welch df is bounded by na+nb-2 and above min(na,nb)-1
    df = r["df_millis"] / 1000
    assert min(r["na"], r["nb"]) - 1 <= df <= r["na"] + r["nb"] - 2


def test_zipf_slope_negative(spark, sf_dir):
    r = QUERIES["q_zipf"](spark, sf_dir).collect()[0]
    # frequency decays with rank: slope strictly negative, and not
    # absurdly steep for a ~100-word synthetic vocabulary
    assert -5_000_000 < r["zipf_slope_micros"] < 0
    assert r["n_tokens"] > 10


def test_hhi_bounds(spark, sf_dir):
    rows = QUERIES["q_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI in micro-points on the 0..10000 scale
        assert 0 < r["hhi_micropoints"] <= 10_000 * 1_000_000


def test_seasonal_adjust_preserves_scale(spark, sf_dir):
    rows = QUERIES["q_seasonal_adjust"](spark, sf_dir).collect()
    assert rows
    raw = sum(r["rev"] for r in rows)
    adj = sum(r["adj_rev_micros"] for r in rows)
    # de-seasonalizing redistributes but roughly preserves total mass
    assert abs(adj - raw) / raw < 0.05
    # indices straddle 1.0
    idx = {r["index_micros"] for r in rows}
    assert min(idx) < 1_000_000 < max(idx)


def test_heaps_beta_in_unit_interval(spark, sf_dir):
    r = QUERIES["q_heaps"](spark, sf_dir).collect()[0]
    # sublinear vocabulary growth: 0 < beta < 1 (closed small
    # synthetic vocab pushes beta low, but never negative or >= 1)
    assert 0 < r["heaps_beta_micros"] < 1_000_000
    assert r["n_docs"] > 0


def test_lorenz_points_monotone_shares(spark, sf_dir):
    rows = sorted(
        QUERIES["q_lorenz_points"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["share_micros"] for r in rows]
    # deciles ordered by spend: shares non-decreasing, sum to ~1
    assert shares == sorted(shares)
    assert abs(sum(shares) - 1_000_000) <= 10


def test_collocations_min_count(spark, sf_dir):
    rows = QUERIES["q_collocations"](spark, sf_dir).collect()
    assert rows and all(r["n_ab"] >= 10 for r in rows)


def test_decile_lift_top_heavy(spark, sf_dir):
    rows = sorted(
        QUERIES["q_decile_lift"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    # decile 1 = top spenders: lift must be >= the bottom decile's
    assert rows[0]["lift_micros"] >= rows[-1]["lift_micros"]
    # weighted average lift over deciles ~ 1.0
    tot_users = sum(r["n_users"] for r in rows)
    wavg = sum(r["lift_micros"] * r["n_users"] for r in rows) / tot_users
    assert abs(wavg - 1_000_000) < 20_000


def test_token_entropy_bounds(spark, sf_dir):
    r = QUERIES["q_token_entropy"](spark, sf_dir).collect()[0]
    import math

    h = r["entropy_nanos_sum"] / 1e9
    # 0 <= H <= ln(vocab)
    assert 0 < h <= math.log(r["vocab_size"]) + 1e-6
    # effective vocab can't exceed the actual vocab
    assert math.exp(h) <= r["vocab_size"] + 1


def test_value_percentile_consistency(spark, sf_dir):
    rows = QUERIES["q_value_percentile"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_below"] <= r["n"]
        assert 0 <= r["percentile_micros"] <= 1_000_000


def test_calendar_heatmap_conserves(spark, sf_dir):
    rows = QUERIES["q_calendar_heatmap"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(0 <= r["dow"] <= 6 and r["week_idx"] >= 0 for r in rows)


def test_tukey_outliers_reasonable(spark, sf_dir):
    rows = QUERIES["q_tukey_outliers"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # boxplot outliers are a small minority by construction
        assert 0 <= r["n_outliers"] < 0.2 * r["n"]


def test_days_to_80pct_bounds(spark, sf_dir):
    r = QUERIES["q_days_to_80pct"](spark, sf_dir).collect()[0]
    n_days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("date_trunc('day', o_orderdate)")
        .distinct()
        .count()
    )
    # 80% of revenue needs at least ~60% of uniform days, at most all
    assert 0 < r["days_to_80pct"] <= n_days
    assert r["qualifying_days"] == n_days - r["days_to_80pct"] + 1

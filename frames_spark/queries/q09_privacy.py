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

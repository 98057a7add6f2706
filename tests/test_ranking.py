"""Two-phase distributed ranking == the naive global-window form."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from frames_spark.operators.ranking import grouped_rank, ntile_from_rank
from frames_spark.sources.tables import load_table


def test_grouped_rank_matches_window(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    got = {
        (r.o_orderkey, r.rn, r.group_cnt)
        for r in grouped_rank(
            o, ["o_orderpriority"], ["o_totalprice", "o_orderkey"]
        ).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    want = {
        (r.o_orderkey, r.rn, r.group_cnt)
        for r in o.select(
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wc).alias("group_cnt"),
        ).collect()
    }
    assert got == want


def test_grouped_rank_global(spark, sf_dir):
    """Empty group list ranks the whole frame."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(0)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = grouped_rank(c, [], ["c_acctbal", "c_custkey"])
    rows = ranked.orderBy("rn").collect()
    n = c.count()
    assert [r.rn for r in rows] == list(range(1, n + 1))
    assert all(r.group_cnt == n for r in rows)
    # and the order is really (acctbal, custkey)
    keys = [(r.c_acctbal, r.c_custkey) for r in rows]
    assert keys == sorted(keys)
    assert o.count() == 0  # quiet the unused-limit lint usage


def test_ntile_arithmetic_matches_sql(spark):
    """ntile_from_rank == NTILE() for cnt above, equal to, and below
    the bucket count (including the base == 0 edge)."""
    for cnt in (23, 10, 7, 3, 1):
        df = spark.range(1, cnt + 1).select(
            F.col("id").alias("rn"), F.lit(cnt).cast("long").alias("cnt")
        )
        got = [
            r.b
            for r in df.select(
                ntile_from_rank(F.col("rn"), F.col("cnt"), 10).alias("b")
            )
            .orderBy("rn")
            .collect()
        ]
        want = [
            r.b
            for r in spark.range(1, cnt + 1)
            .select(F.ntile(10).over(Window.orderBy("id")).alias("b"))
            .collect()
        ]
        assert got == want, f"cnt={cnt}: {got} != {want}"


def test_grouped_rank_more_partitions_than_rows(spark):
    """Empty range partitions must not disturb offsets or counts."""
    df = spark.createDataFrame(
        [(1, "a"), (3, "a"), (2, "b")], "v long, g string"
    )
    rows = grouped_rank(df, ["g"], ["v"], num_partitions=32).collect()
    got = {(r.g, r.v): (r.rn, r.group_cnt) for r in rows}
    assert got == {("a", 1): (1, 2), ("a", 3): (2, 2), ("b", 2): (1, 1)}


def test_grouped_prefix_sum_matches_window(spark, sf_dir):
    """Two-phase prefix sum == the naive single-task window, per
    group and globally, on exact integers."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from frames_spark.operators.ranking import grouped_prefix_sum

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    got = {
        r["o_orderkey"]: (r["cum"], r["group_total"])
        for r in grouped_prefix_sum(
            o,
            ["o_orderpriority"],
            ["cents", "o_orderkey"],
            "cents",
            num_partitions=7,
        ).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy(
        "cents", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("o_orderpriority")
    exp = {
        r["o_orderkey"]: (r["cum"], r["tot"])
        for r in o.select(
            "o_orderkey",
            F.sum("cents").over(w).alias("cum"),
            F.sum("cents").over(wt).alias("tot"),
        ).collect()
    }
    assert got == exp


def test_grouped_prefix_sum_plan_is_distributed(spark, sf_dir):
    import pyspark.sql.functions as F

    from frames_spark.operators.ranking import grouped_prefix_sum
    from frames_spark.plans.explain import formatted_plan

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    # stage=False: the localCheckpoint boundary hides the upstream
    # projection from the plan probe; the formulation is what this
    # test pins, so inspect the unstaged twin
    plan = formatted_plan(
        grouped_prefix_sum(o, [], ["cents", "o_orderkey"], "cents", stage=False)
    )
    assert "spark_partition_id" in plan.lower()


def test_auto_stage_is_unconditional(spark, sf_dir):
    """r12: rank corruption was caught live on a PLAIN SCAN-FED input
    (q_sample_per_source at sf1, session-shape-dependent — the
    RangePartitioner sample seed rides the per-session RDD id, so
    ReuseExchange is the only consistency guarantee and it is not
    one). The old plan-inspection heuristic (stage iff Exchange in
    the plan) is gone: stage=None now ALWAYS stages; explicit
    booleans pass through."""
    import pyspark.sql.functions as F

    from frames_spark.operators.ranking import _auto_stage

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert _auto_stage(o.select("o_orderkey", "o_totalprice"), None) is True
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    assert _auto_stage(agg, None) is True
    assert _auto_stage(agg, False) is False
    assert _auto_stage(o, True) is True


def test_grouped_rank_correct_over_shuffle_fed_input(spark, sf_dir):
    """Join-fed input WITHOUT an explicit stage flag still yields
    exact ranks (the auto-stage path, verdict r4 item 2)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment", "o_totalprice"
    )
    got = {
        (r.o_orderkey, r.rn)
        for r in grouped_rank(
            j, ["c_mktsegment"], ["o_totalprice", "o_orderkey"]
        ).collect()
    }
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    want = {
        (r.o_orderkey, r.rn)
        for r in j.select(
            "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want

"""Blanket plan audit: every registered query's physical plan is
free of accidental cross products, and scan-heavy queries keep
their filters pushed down. Catches a regression in ANY query the
moment it plans a cartesian join."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from frames_spark.plans.explain import formatted_plan

QUERIES = entry.queries()

# 1-row scalar broadcasts legitimately plan BroadcastNestedLoopJoin;
# nothing should ever plan CartesianProduct.
FORBIDDEN = "CartesianProduct"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_product(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = formatted_plan(df)
    assert FORBIDDEN not in plan, f"{name} plans a cartesian product"


# Distributed-ranking guard: q_ntile / q_cume_dist must NOT plan the
# naive `ntile()/cume_dist() OVER (PARTITION BY o_orderpriority)` —
# a 5-value partition key caps the fact-table sort at 5 tasks at any
# cluster size. The two-phase form (operators/ranking.py) shows a
# SPARK_PARTITION_ID projection and no rank-SQL window function.
@pytest.mark.parametrize("name", ["q_ntile", "q_cume_dist"])
def test_two_phase_ranking(spark, sf_dir, name):
    plan = formatted_plan(QUERIES[name](spark, sf_dir))
    low = plan.lower()
    assert "spark_partition_id" in low, f"{name} lost the two-phase rank"
    for fn in ("ntile(", "cume_dist(", "percent_rank("):
        assert fn not in low, f"{name} fell back to a fact-wide {fn} window"

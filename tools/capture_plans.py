"""Dump .explain("formatted") for bench queries to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND (default r15)/<query>_<suffix>.txt for each named bench key
(default: all BENCH_QUERIES). Plan capture is driver-side analysis
only — no jobs run except the eager pre-flights some governed
queries perform by design (e.g. suggest_num_planes count()).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, SF_DIR  # noqa: E402
from frames_spark.plans.explain import formatted_plan  # noqa: E402
from frames_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or sorted(BENCH_QUERIES)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        try:
            df = BENCH_QUERIES[name](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(name, flush=True)
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()

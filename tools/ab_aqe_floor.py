"""Interleaved per-rep A/B of the AQE coalescing floor (r15 item 1).

The two-full-bench A/B is confounded by window drift (the r14/r15
boxes swing 1.1-1.6x between runs). This driver removes the
confounder: ONE session, and for every bench key the reps alternate
floors A,B,A,B,A,B (the conf is runtime-settable and AQE reads it at
query execution), so both arms of every comparison run seconds apart
in the same window. Best-of-3 per arm per key, same rep hygiene as
bench.py (clearCache per rep, frame rebuilt per rep).

Usage: python tools/ab_aqe_floor.py [key ...]   (default: all keys)
Prints one JSON line {key: {"64k": s, "1m": s}} plus kernels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    BENCH_QUERIES,
    SF_DIR,
    calibration_kernel,
    job_overhead_kernel,
    materialize,
)
from frames_spark.session import get_spark

FLOOR_CONF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
ARMS = ("64k", "1m")


def main(names: list[str]) -> None:
    spark = get_spark("ab-aqe-floor")
    materialize(BENCH_QUERIES["q1"](spark, SF_DIR).limit(1))
    job_overhead_kernel(spark)
    calib = calibration_kernel()
    out: dict[str, dict[str, float]] = {}
    for name in names or sorted(BENCH_QUERIES):
        fn = BENCH_QUERIES[name]
        best = {arm: float("inf") for arm in ARMS}
        try:
            for _ in range(3):
                for arm in ARMS:
                    spark.conf.set(FLOOR_CONF, arm)
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    materialize(fn(spark, SF_DIR))
                    best[arm] = min(best[arm], time.perf_counter() - t0)
            out[name] = {arm: round(best[arm], 3) for arm in ARMS}
        except Exception as exc:  # noqa: BLE001
            print(f"AB ERROR {name}: {type(exc).__name__}", file=sys.stderr)
    job_after = job_overhead_kernel(spark)
    print(json.dumps({
        "calib": calib, "job_after": job_after, "keys": out,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])

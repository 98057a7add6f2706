"""Idle best-of-3 timer for pinning NEW bench queries (the BASELINE.md
re-pin protocol): runs the calibration kernel, then each named query
best-of-3 at sf0.1, in one fresh process. Run this 3 independent
times and pin the per-query MINIMUM."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, calibration_kernel, materialize  # noqa: E402
from frames_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main(names: list[str]) -> None:
    spark = get_spark("time-new")
    calib = calibration_kernel()
    out: dict[str, float] = {}
    for name in names:
        fn = BENCH_QUERIES[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"calib": round(calib, 4), "best3": out}))


if __name__ == "__main__":
    main(sys.argv[1:])

"""CLI: run any registered query by name and show rows + plan.

    python -m frames_spark q_group_fold [sf_dir] [--explain] [--advise] [-n 20]

Lists all queries when invoked without arguments. ``--advise`` runs
the static plan advisor (plans/advisor.py) and prints findings
instead of executing.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    from frames_spark import queries as Q
    from frames_spark.session import get_spark

    p = argparse.ArgumentParser(prog="frames_spark")
    p.add_argument("query", nargs="?", help="query name (omit to list)")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("-n", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    p.add_argument(
        "--advise", action="store_true",
        help="run the plan advisor and exit (1 if findings)",
    )
    args = p.parse_args()

    if not args.query:
        for name in sorted(Q.QUERIES):
            mark = "sql-oracle" if name in Q.ORACLES else "rows-only"
            print(f"{name:28s} {mark}")
        return 0
    if args.query not in Q.QUERIES:
        print(f"unknown query {args.query!r}; run with no args to list", file=sys.stderr)
        return 2
    spark = get_spark("frames_spark_cli")
    df = Q.QUERIES[args.query](spark, args.sf_dir)
    if args.advise:
        from frames_spark.plans.advisor import advise

        findings = advise(df)
        for f in findings:
            print(f"{f.code}: {f.detail}")
        if not findings:
            print("clean")
        return 1 if findings else 0
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and
its ``oracle_sql()`` twin on DuckDB at sf0.01, then compares
row count, column-name set, and order-insensitive values (columns
sorted by name, rows sorted). Floats compared both exactly and with
tolerance so hash-level divergence shows up before the driver sees it.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp directory, so any operator that
    # needs to spill (the sf10 banded-candidate DISTINCT, large hash
    # joins) dies with "Out of Memory Error: failed to allocate"
    # instead of spilling — the r13 gopher_gate_counts class, found
    # again by the r14 sf10 probe. Point it at disk explicitly.
    con.sql("SET temp_directory='/tmp/duck_oracle_spill'")
    con.sql("SET max_temp_directory_size='60GiB'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then sort rows; stringify for stable order."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            vals.append(r[i])
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


STRICT = os.environ.get("STRICT", "1") == "1"  # exact == hash-stable

# DuckDB type -> Spark simpleString equivalent. The driver's value hash is
# type-sensitive (r1: DuckDB HUGEINT vs Spark BIGINT hash-mismatched with
# identical values), so values_close alone cannot prove driver-green —
# compare declared column types too. Timestamp LTZ/NTZ collapse to one
# class: both engines render identical UTC micros and r1 driver rows with
# timestamps passed across that divide.
_DUCK_TO_SPARK = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "hugeint",  # never matches a Spark type -> always FAIL
    "UHUGEINT": "uhugeint",
    "UBIGINT": "ubigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
}


def _canon_type(t: str) -> str:
    t = t.strip().lower()
    if t == "timestamp_ntz":
        return "timestamp"
    return t


def type_mismatches(
    duck_types: list, duck_cols: list[str], spark_dtypes: list[tuple[str, str]]
) -> list[str]:
    """Column-name-matched declared-type comparison; returns problem strings."""
    spark_by_col = {c: _canon_type(t) for c, t in spark_dtypes}
    out = []
    for col, dt in zip(duck_cols, duck_types):
        ds = str(dt).upper()
        mapped = _DUCK_TO_SPARK.get(ds)
        if mapped is None and ds.endswith("[]"):
            # DuckDB list spelling T[] vs Spark array<t>
            inner = ds[:-2].strip()
            mapped = f"array<{_DUCK_TO_SPARK.get(inner, inner.lower())}>"
        if mapped is None:
            # DECIMAL(p,s), STRUCT... compare lowercased spelling;
            # duckdb DECIMAL(10,2) vs spark decimal(10,2) line up.
            mapped = ds.lower()
        mapped = _canon_type(mapped)
        st = spark_by_col.get(col)
        if st is not None and st != mapped:
            out.append(f"TYPE {col}: duck={ds} spark={st}")
    return out


def values_close(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        if STRICT:
            return float(a) == float(b)
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-9)
    return a == b


def main() -> int:
    import __spark_entry__ as entrymod
    from frames_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check_oracle")
    con = duck_connection()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        status = []
        # One broken query records one FAIL line and the sweep continues;
        # an uncaught AnalysisException here once masked 89 later queries.
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            print(f"FAIL {name:24s} {time.time() - t0:6.1f}s  ERR {msg}")
            failures.append(name)
            continue
        scols = list(sdf.columns)
        if name not in oracles:
            status.append(f"rows-only ({len(srows)} rows)")
            ok = len(srows) >= 0
        else:
            try:
                rel = con.sql(oracles[name])
                dtypes = list(rel.types)
                drows = [tuple(r) for r in rel.fetchall()]
                dcols = list(rel.columns)
            except Exception as exc:  # noqa: BLE001
                msg = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
                print(f"FAIL {name:24s} {time.time() - t0:6.1f}s  ORACLE-ERR {msg}")
                failures.append(name)
                continue
            ok = True
            if sorted(scols) != sorted(dcols):
                ok = False
                status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
            tmis = type_mismatches(dtypes, dcols, sdf.dtypes)
            if tmis:
                ok = False
                status.extend(tmis)
            if len(srows) != len(drows):
                ok = False
                status.append(f"ROWS spark={len(srows)} duck={len(drows)}")
            if ok:
                ns, nd = normalize(srows, scols), normalize(drows, dcols)
                bad = 0
                for rs, rd in zip(ns, nd):
                    if not all(values_close(a, b) for a, b in zip(rs, rd)):
                        bad += 1
                        if bad <= 3:
                            status.append(f"VAL {rs} != {rd}")
                if bad:
                    ok = False
                    status.append(f"{bad} mismatched rows")
                else:
                    status.append(f"match ({len(srows)} rows)")
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:24s} {dt:6.1f}s  {'; '.join(status)}")
        if not ok:
            failures.append(name)
    # count what actually RAN: the old `registered - failures` form
    # reported "114/114 passed" on a subset run with one failure
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

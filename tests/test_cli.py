"""CLI smoke (frames_spark/__main__.py): the one consumer surface
with no other pytest coverage — run a tiny query in a subprocess and
assert row output, listing, advisor output shape, and exit codes."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "frames_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_cli_runs_query_and_shows_rows():
    r = _run("q_group_fold", SF, "-n", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    # .show() table: header row with the query's columns + data rows
    assert "l_returnflag" in r.stdout
    assert "sum_qty" in r.stdout
    assert "only showing top 3 rows" in r.stdout or r.stdout.count("|") > 10


def test_cli_lists_queries_without_args():
    r = _run()
    assert r.returncode == 0
    assert "q_group_fold" in r.stdout and "sql-oracle" in r.stdout


def test_cli_unknown_query_exit_code():
    r = _run("q_definitely_not_registered")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_advise_clean_query():
    r = _run("q_group_fold", SF, "--advise")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "clean" in r.stdout

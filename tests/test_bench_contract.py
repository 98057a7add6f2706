"""bench.py's driver output contract.

The round driver captures only the last ~2.2 KB of bench.py's stdout
and parses the FINAL line as BENCH_r{N}.json. Round 7's 84-query map
pushed the single output line past that capture and the driver
recorded "parsed": null. The contract is now: full artifact on a
preceding line, bounded summary (scalars + slowest-10 map) as the
final line, hard-capped under 2000 bytes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_out(n_queries: int) -> dict:
    times = {f"query_name_{i:03d}": round(0.123 + i * 0.01, 3) for i in range(n_queries)}
    times["broken_one"] = None
    return {
        "metric": "total_bench_seconds",
        "value": round(sum(t for t in times.values() if t), 3),
        "unit": "sec",
        "queries": times,
        "sf": 0.1,
        "failed": ["broken_one"],
        "calib_before_sec": 0.0847,
        "calib_after_sec": 0.0912,
        "bw_before_sec": 0.0231,
        "bw_after_sec": 0.0240,
        "job_before_sec": 0.4821,
        "job_after_sec": 0.5012,
        "vs_baseline": 1.014,
        "box_noise_factor": 1.09,
        "bw_noise_factor": 1.04,
        "job_noise_factor": 1.06,
    }


def test_summary_line_under_capture_even_at_200_queries():
    line = bench.summary_line(_fake_out(200))
    assert len(line) < 2000
    parsed = json.loads(line)
    # every driver-graded scalar survives into the final line
    for key in (
        "metric",
        "value",
        "unit",
        "sf",
        "failed",
        "vs_baseline",
        "box_noise_factor",
        "bw_noise_factor",
        "calib_before_sec",
        "calib_after_sec",
        "bw_before_sec",
        "bw_after_sec",
        "job_before_sec",
        "job_after_sec",
        "job_noise_factor",
    ):
        assert key in parsed, key
    assert parsed["n_queries"] == 201
    # the bounded map carries the 10 slowest (None entries excluded)
    assert len(parsed["queries"]) == 10
    assert "query_name_199" in parsed["queries"]
    assert "broken_one" not in parsed["queries"]


def test_summary_line_is_valid_singleline_json():
    line = bench.summary_line(_fake_out(84))
    assert "\n" not in line
    assert json.loads(line)["metric"] == "total_bench_seconds"


def test_summary_line_truncates_never_asserts():
    """The fallback is hard truncation: absurd query names / a huge
    failed list must still produce a < 2000 B final line (the old
    bare assert stripped under python -O and would have let the
    oversized full-map line end last)."""
    out = _fake_out(5)
    out["queries"] = {
        ("very_long_query_name_" * 20) + str(i): 1.0 + i for i in range(10)
    }
    line = bench.summary_line(out)
    assert len(line) < 2000
    assert json.loads(line)["value"] == out["value"]

    out = _fake_out(5)
    out["failed"] = [("broken_query_" * 30) + str(i) for i in range(50)]
    line = bench.summary_line(out)
    assert len(line) < 2000
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert parsed.get("failed_count") == 50


def test_bench_registry_matches_current_size():
    # the real registry must also fit: names are longer than the fake's,
    # so check the actual worst case — all bench query names at 5-digit
    # seconds still leaves the scalar part plus 10 entries under the cap
    longest = sorted(bench.BENCH_QUERIES, key=len)[-10:]
    out = _fake_out(0)
    out["queries"] = {n: 99999.999 for n in longest}
    assert len(bench.summary_line(out)) < 2000


def test_job_overhead_kernel_pinned_in_baseline():
    # r10 verdict #2: the scheduler-overhead kernel is load-bearing
    # for drift adjudication — the pin must exist, the kernel must be
    # importable, and bench must fold its ratio into the noise max
    base = bench.load_baseline()
    assert base is not None
    assert 0 < base["job_calib_sec"] < 10
    assert callable(bench.job_overhead_kernel)


def test_full_artifact_schema_and_roundtrip(tmp_path, monkeypatch):
    """The committed sweeps/BENCH_full_{tag}.json must carry the
    COMPLETE queries map (every key, including nulls for failed
    queries) and every calibration/noise scalar — a judge computes
    all pin ratios from this file alone (r11 verdict #1)."""
    out = _fake_out(200)
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TAG", "rtest")
    path = bench.write_full_artifact(out)
    assert path == str(tmp_path / "sweeps" / "BENCH_full_rtest.json")
    loaded = json.load(open(path))
    assert loaded == out  # lossless: no truncation, no slowest-N cap
    assert len(loaded["queries"]) == 201
    assert loaded["queries"]["broken_one"] is None
    for key in (
        "metric", "value", "unit", "sf", "failed", "vs_baseline",
        "calib_before_sec", "calib_after_sec",
        "bw_before_sec", "bw_after_sec",
        "job_before_sec", "job_after_sec",
        "box_noise_factor", "bw_noise_factor", "job_noise_factor",
    ):
        assert key in loaded, key


def test_artifact_tag_derives_next_round(tmp_path, monkeypatch):
    """Without the env override the tag is r{N+1} over the driver's
    BENCH_r{N}.json files — the full artifact lands beside the round
    it certifies."""
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py"))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_TAG", raising=False)
    assert bench.artifact_tag() == "r1"  # empty repo -> first round
    (tmp_path / "BENCH_r04.json").write_text("{}")
    (tmp_path / "BENCH_r11.json").write_text("{}")
    (tmp_path / "BENCH_rbogus.json").write_text("{}")  # ignored
    assert bench.artifact_tag() == "r12"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TAG", "adhoc_sf1")
    assert bench.artifact_tag() == "adhoc_sf1"

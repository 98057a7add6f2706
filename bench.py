"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query materializes fully through the noop sink (no count-star
shortcuts, no driver collect cost). A tiny warmup action amortizes
JVM/codegen startup out of the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frames_spark import queries as Q
from frames_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASELINE_MD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")


def load_baseline() -> dict | None:
    """Pinned per-query numbers from BASELINE.md's ```json baseline``` block."""
    try:
        text = open(BASELINE_MD).read()
        block = text.split("```json baseline", 1)[1].split("```", 1)[0]
        return json.loads(block)
    except (OSError, IndexError, ValueError):
        return None

# Representative, scale-relevant set: the flagship fold (production
# double-typed variant), scan+filter, joins, window analytics, event
# rollup, and the training-data-pipeline operators (exact dedup,
# MinHash LSH, bucketed embedding dedup, brute-force ANN, text stats).
BENCH_QUERIES = {
    "q1": Q.q1_bench,
    "filter_project": Q.q_filter_project,
    "join_inner": Q.q_join_inner,
    "join_multi": Q.q_join_multi,
    "topk_per_group": Q.q_topk_per_group,
    "events_window": Q.q_events_window,
    "sessionize": Q.q_sessionize,
    "dedup_exact": Q.q_dedup_exact,
    "dedup_minhash": Q.q_dedup_minhash,
    "dedup_embed_lsh": Q.q_dedup_embed_lsh,
    "ann_bruteforce": Q.q_ann_bruteforce,
    "text_stats": Q.q_text_stats,
    "langid": Q.q_langid,
    "top_unshipped": Q.q_top_unshipped,
    "sample_hash": Q.q_sample_hash,
    "asof_join": Q.q_asof_join,
    "range_join": Q.q_range_join,
    "cube": Q.q_cube,
    "quantiles": Q.q_quantiles,
    "count_distinct": Q.q_count_distinct,
    "ann_ivf": Q.q_ann_ivf,
    "pipeline_clean": Q.q_pipeline_clean,
    "dedup_clusters": Q.q_dedup_clusters,
    "funnel": Q.q_funnel_counts,
    "late_exists": Q.q_late_exists,
    "big_orders": Q.q_big_orders,
    "small_qty_revenue": Q.q_small_qty_revenue,
    "weighted_sample": Q.q_weighted_sample,
    "concurrency": Q.q_concurrency,
    "scd2": Q.q_scd2,
    "cohort_retention": Q.q_cohort_retention,
    "winsorize": Q.q_winsorize,
    "mad_outliers": Q.q_mad_outliers,
    "nation_volume": Q.q_nation_volume,
    "ntile": Q.q_ntile,
    "market_share": Q.q_market_share,
    "sole_delayed": Q.q_sole_delayed,
    "boilerplate": Q.q_boilerplate,
    "unigram_logprob": Q.q_unigram_logprob,
    "new_vs_returning": Q.q_new_vs_returning,
    "gopher_quality": Q.q_gopher_quality,
    "embed_covariance": Q.q_embed_covariance,
    "hist_quantiles": Q.q_hist_quantiles,
    "heavy_hitters": Q.q_heavy_hitters,
    "bm25": Q.q_bm25,
    "group_median": Q.q_group_median_scalable,
    "triangle_count": Q.q_triangle_count,
    "attribution": Q.q_attribution,
    "abc_analysis": Q.q_abc_analysis,
    "funnel_windowed": Q.q_funnel_windowed,
    "pipeline_product": Q.q_pipeline_product,
    "substring_dedup": Q.q_substring_dedup,
    "gram_novelty": Q.q_gram_novelty,
    "kruskal_wallis": Q.q_kruskal_wallis,
    "doc_keywords": Q.q_doc_keywords,
    "theil_sen": Q.q_theil_sen,
    "containment": Q.q_containment,
    "containment_auto": Q.q_containment_auto,
    "dedup_curve_auto": Q.q_dedup_curve_auto,
    "html_extract": Q.q_html_extract,
    "gopher_repetition": Q.q_gopher_repetition,
    "line_dedup": Q.q_line_dedup,
    "js_source": Q.q_js_source,
    "gopher_full": Q.q_gopher_full,
    "incremental_dedup": Q.q_incremental_dedup,
    "lsh_bucket_stats": Q.q_lsh_bucket_stats,
    "skyline": Q.q_skyline,
    "ccnet_buckets": Q.q_ccnet_buckets,
    "fertility": Q.q_fertility,
    "simhash_accuracy": Q.q_simhash_accuracy,
    "clustering_coeff": Q.q_clustering_coeff,
    "semdedup": Q.q_semdedup,
    "dsir": Q.q_dsir,
    "nb_confusion": Q.q_nb_confusion,
    "kcenter": Q.q_kcenter,
    "edit_join": Q.q_edit_join,
    "rrf_hybrid": Q.q_rrf_hybrid,
    "session_window": Q.q_session_window,
    "entity_clusters": Q.q_entity_clusters,
    "ann_multiprobe": Q.q_ann_multiprobe,
    "curate_select": Q.q_curate_select,
    "winnow": Q.q_winnow,
    "winnow_matches": Q.q_winnow_matches,
    "hll_cells": Q.q_hll_cells,
    "bloom_fpr": Q.q_bloom_fpr,
    "kmv_overlap": Q.q_kmv_overlap,
    "unigram_em1": Q.q_unigram_em1,
    "semdedup_cells": Q.q_semdedup_cells,
    "k_anonymity": Q.q_k_anonymity,
    "sketch_users_weekly": Q.q_sketch_users_weekly,
    "pca_power": Q.q_pca_power,
    "hard_negatives": Q.q_hard_negatives,
    "triplet_mining": Q.q_triplet_mining,
    "embed_bucket_stats": Q.q_embed_bucket_stats,
    "bpe_merges": Q.q_bpe_merges,
    "dedup_ngram_auto": Q.q_dedup_ngram_auto,
    "hard_negatives_auto": Q.q_hard_negatives_auto,
    "triplet_mining_auto": Q.q_triplet_mining_auto,
    "dedup_embed_auto": Q.q_dedup_embed_auto,
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibration_kernel() -> float:
    """Best-of-3 seconds for a FIXED CPU-bound kernel (~130 MB of
    sha256), run before and after the query loop.

    This box shows 3-9x co-tenant swings; a slow window inflates
    every query by a similar factor and can fake a >2x pin breach on
    untouched code (r4's q1 entry adjudicated to noise only via a
    manual retime session). The kernel makes that machine-detectable
    in the artifact itself: compare calib_before/after_sec against
    BASELINE.md's calib_sec — a ratio well above 1 means the whole
    window ran slow and per-query ratios should be read against it."""
    import hashlib

    block = b"\x5a" * 65536
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(2000):
            h.update(block)
        h.hexdigest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def bw_calibration_kernel() -> float:
    """Best-of-3 seconds to sum a 256 MB int64 buffer — MEMORY-
    BANDWIDTH-bound where the sha256 kernel is core-bound. Three
    consecutive rounds (r7-r9) showed windows where the crypto calib
    read ~1.0 while every query inflated 10-30%: co-tenants competing
    for memory bandwidth are invisible to a cache-resident CPU kernel.
    Pin: bw_calib_sec in BASELINE.md; per-query breach adjudication
    reads ratios against max(box_noise_factor, bw_noise_factor)."""
    import numpy as np

    n = 32 * 1024 * 1024  # 256 MB of int64
    arr = np.ones(n, dtype=np.int64)
    best = float("inf")
    total = 0
    for _ in range(3):
        t0 = time.perf_counter()
        total = int(arr.sum())
        best = min(best, time.perf_counter() - t0)
    if total != n:  # defeated dead-code elimination, never fires
        raise RuntimeError("bw kernel sum mismatch")
    return round(best, 4)


def job_overhead_kernel(spark) -> float:
    """Best-of-3 seconds for a FIXED 8-JOB no-op query chain: 4
    rounds of localCheckpoint + count on a 1-row frame. The third
    calibration axis (r10 verdict #2): the crypto kernel sees core
    contention and the numpy kernel sees memory-bandwidth
    contention, but neither sees SCHEDULER contention — the r8/r10
    group_median / curate_select drift class, where multi-JOB
    queries (driver-side iteration, eager pre-flights) inflate
    1.3-1.5x while single-job siblings and both kernels read clean
    (bisect-proven environmental: pin-era code showed the same
    drift). This kernel is ~pure per-job overhead — submit,
    schedule, one empty task, collect — so its ratio against
    BASELINE.md's job_calib_sec adjudicates that class
    automatically. The dozen 1-row checkpoint RDDs it leaks are
    process-lifetime noise in a standalone bench run."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df = spark.range(1)
        for _ in range(4):
            df = df.localCheckpoint()
            df.count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    spark = get_spark("frames_spark_bench")
    # warmup: JVM + parquet footer caches
    materialize(Q.q1_bench(spark, SF_DIR).limit(1))
    job_overhead_kernel(spark)  # warm the scheduler path once

    # best-of-N: this suppresses co-tenant noise without hiding real
    # cost — each rep re-executes the full plan (nothing is cached).
    # best-of-3 by default: this box shows 3-9x co-tenant swings on
    # identical plans; two reps still leaves occasional double-hits
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    calib_before = calibration_kernel()
    bw_before = bw_calibration_kernel()
    job_before = job_overhead_kernel(spark)
    times: dict[str, float | None] = {}
    for name, fn in BENCH_QUERIES.items():
        # Per-query isolation: one broken query must cost one null entry,
        # not the whole artifact (round 2 lost every number to a single
        # AnalysisException raised before any timing was printed).
        try:
            best = float("inf")
            for _ in range(reps):
                # queries that persist() an intermediate (q_boilerplate's
                # staged spans) must not carry that cache into the next
                # rep — every rep pays the full cold plan
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(fn(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"BENCH ERROR {name}: {type(exc).__name__}", file=sys.stderr)
            times[name] = None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    calib_after = calibration_kernel()
    bw_after = bw_calibration_kernel()
    job_after = job_overhead_kernel(spark)
    ok_times = [t for t in times.values() if t is not None]
    out = {
        "metric": "total_bench_seconds",
        "value": round(sum(ok_times), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "failed": sorted(n for n, t in times.items() if t is None),
        "calib_before_sec": calib_before,
        "calib_after_sec": calib_after,
        "bw_before_sec": bw_before,
        "bw_after_sec": bw_after,
        "job_before_sec": job_before,
        "job_after_sec": job_after,
    }

    base = load_baseline()
    noise = 1.0
    if base and base.get("calib_sec"):
        # >1 means the box ran slower than when the pins were taken;
        # per-query breach adjudication divides by this first.
        out["box_noise_factor"] = round(
            max(calib_before, calib_after) / base["calib_sec"], 2
        )
        noise = max(noise, out["box_noise_factor"])
    if base and base.get("bw_calib_sec"):
        # the memory-bandwidth twin: co-tenant streaming load inflates
        # shuffle/scan-heavy queries while the CPU kernel reads clean.
        out["bw_noise_factor"] = round(
            max(bw_before, bw_after) / base["bw_calib_sec"], 2
        )
        noise = max(noise, out["bw_noise_factor"])
    if base and base.get("job_calib_sec"):
        # the scheduler twin: per-job overhead contention inflates
        # multi-JOB queries (driver loops, eager pre-flights) while
        # both compute kernels read clean — the r8/r10
        # group_median/curate_select drift class.
        out["job_noise_factor"] = round(
            max(job_before, job_after) / base["job_calib_sec"], 2
        )
        noise = max(noise, out["job_noise_factor"])

    # Per-query delta vs the pinned BASELINE.md numbers (the 2x gate's
    # in-repo anchor). Ratios only make sense at the baseline's SF;
    # the breach flag reads the ratio against the WORSE of the two
    # calibration factors so a noisy window can't fake a regression.
    if base and base.get("sf") == sf_val:
        common = [
            n for n, t in times.items() if t is not None and n in base["queries"]
        ]
        for n in common:
            r = times[n] / base["queries"][n]
            adj = r / noise
            flag = "  <-- >2x noise-adj" if adj > 2.0 else ("  (raw >2x)" if r > 2.0 else "")
            print(f"VS-BASELINE {n:20s} {times[n]:7.3f}s / {base['queries'][n]:7.3f}s = {r:5.2f}x adj {adj:5.2f}x{flag}", file=sys.stderr)
        tot_now = sum(times[n] for n in common)
        tot_base = sum(base["queries"][n] for n in common)
        out["vs_baseline"] = round(tot_now / tot_base, 3) if tot_base else None

    # Auditability artifact (r11 verdict #1): the driver's stdout
    # capture bounds the FINAL line to ~2.2 KB, so the COMPLETE
    # per-query map + calibration fields also go to a committed file
    # — a judge can compute every pin ratio without parsing
    # BASELINE.md prose. The round number is derived from the
    # driver-written BENCH_r{N}.json files (this run becomes N+1);
    # overridable for ad-hoc sweeps via SPARK_GRAFT_BENCH_TAG.
    write_full_artifact(out)

    # Output contract: the driver captures only the last ~2.2 KB of
    # stdout and parses the FINAL line as the round's bench artifact.
    # At 84 queries the full per-query map alone exceeds that (r7's
    # BENCH artifact came back "parsed": null with the head of the
    # line cut off), so the full object goes on a PRECEDING line and
    # the final line is a bounded summary: scalar fields + the
    # slowest-10 query map (~600 B — size pinned by a pytest test).
    print(json.dumps(out))
    print(summary_line(out))


def artifact_tag() -> str:
    """Tag for the full-artifact filename: SPARK_GRAFT_BENCH_TAG if
    set, else r{N+1} where N is the highest driver-written
    BENCH_r{N}.json in the repo root (the driver records THIS run as
    round N+1)."""
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        return tag
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in os.listdir(root)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return f"r{max(rounds, default=0) + 1}"


def write_full_artifact(out: dict) -> str | None:
    """Write the COMPLETE bench object (full queries map, all calib
    fields, no size cap) to sweeps/BENCH_full_{tag}.json, pretty-
    printed for diff-friendly commits. Returns the path, or None if
    the write fails (the stdout contract must survive a read-only
    checkout)."""
    root = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(root, "sweeps", f"BENCH_full_{artifact_tag()}.json")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"BENCH full-artifact write failed: {exc}", file=sys.stderr)
        return None
    print(f"BENCH full artifact: {path}", file=sys.stderr)
    return path


def summary_line(out: dict) -> str:
    """The driver-facing FINAL stdout line: every scalar field of the
    full artifact plus the slowest-10 query map, guaranteed < 2000 B
    (the driver's tail capture is ~2.2 KB and parses the last line).

    Hard truncation, not an assert (r9 advice: a bare assert strips
    under ``python -O``, and if it ever fired the oversized line would
    have become the FINAL stdout line — the exact ``parsed: null``
    failure this contract exists to prevent): shrink the slowest-N
    map, then drop list-valued scalars, until the line fits."""
    times = out["queries"]
    ranked = sorted(
        ((n, t) for n, t in times.items() if t is not None),
        key=lambda kv: -kv[1],
    )
    summary = {k: v for k, v in out.items() if k != "queries"}
    summary["n_queries"] = len(times)
    for n_slow in range(10, -1, -1):
        summary["queries"] = dict(ranked[:n_slow])
        line = json.dumps(summary)
        if len(line) < 2000:
            return line
    # Pathological field sizes (e.g. a huge failed-query list): keep
    # only the graded scalars. This branch is unreachable for any
    # realistic registry but the contract must never emit an
    # oversized final line.
    minimal = {
        k: summary.get(k)
        for k in ("metric", "value", "unit", "sf", "vs_baseline",
                  "box_noise_factor", "bw_noise_factor", "n_queries")
        if k in summary
    }
    minimal["failed_count"] = len(out.get("failed", []))
    return json.dumps(minimal)


if __name__ == "__main__":
    main()

"""Plan advisor: static anti-pattern audit of a DataFrame's physical
plan BEFORE it runs.

`.explain()` tells an expert what the plan does; the advisor tells
everyone what will hurt at 1000 executors. It pattern-matches the
formatted physical plan for the failure modes this engine designs
around (SURVEY.md §6) and returns structured findings, so pipelines
can gate on `advise(df)` in CI the same way tests/test_plan_hygiene.py
gates the registered queries:

- CARTESIAN            CartesianProduct — O(|A|x|B|), almost always a
                       missing join key.
- GLOBAL_WINDOW        a window with no PARTITION BY over a plan that
                       scans fact-sized input — every row lands on ONE
                       task. (Tiny aggregated relations are the
                       legitimate exception; the advisor flags only
                       windows fed by scans without an aggregate in
                       between.)
- NO_PUSHDOWN          a parquet scan whose filter stayed in the plan
                       instead of reaching PushedFilters.
- WIDE_SCAN            a scan reading many more columns than the query
                       references — column pruning lost.
- ROW_PYTHON_UDF       row-at-a-time BatchEvalPython in the plan; the
                       10-100x-slower path vs Arrow/pandas or JVM
                       expressions.
- BROADCAST_SCALED     a FORCED broadcast hint (ResolvedHint in the
                       analyzed logical plan) whose subtree scans an
                       SF-scaled table with nothing bounding its row
                       count in between. Hints bypass Spark's size
                       check, so at the 100 TB target the broadcast
                       is attempted anyway and OOMs instead of
                       demoting to a shuffle join. Bounded shapes are
                       accepted: an Aggregate, a Limit, a
                       Deduplicate, or a Filter pinning the table's
                       id/key column to literals (an explicit query
                       set). Scaled dims must go through
                       operators.joins.dim_join (un-hinted; AQE
                       broadcasts when the runtime size fits).

Each finding is (code, detail). An empty list is the passing grade.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from frames_spark.plans.explain import analyzed_plan, formatted_plan

__all__ = ["Finding", "advise", "assert_clean"]

# One signature column per table whose row count grows linearly with
# the corpus (TPC-H scaled tables + the LLM-pipeline fact tables).
# A leaf Relation in the analyzed plan lists the parquet file's own
# columns, so seeing one of these names identifies the scan.
_SCALED_SIGNATURES = (
    "c_custkey",
    "p_partkey",
    "s_suppkey",
    "o_orderkey",
    "l_orderkey",
    "event_id",
    "doc_id",
    "vec_id",
)

# Logical nodes that bound the broadcast side's cardinality no matter
# how large the underlying scan is.
_BOUNDING_NODES = ("Aggregate [", "GlobalLimit", "LocalLimit", "Deduplicate")

# A Filter that pins the scan's id/key column to literals (IN-list,
# equality, or a small upper bound) is an explicit query set — e.g.
# ANN query vectors `vec_id < 3` — bounded by the literal, not by SF.
# The column reference may sit inside an implicit-coercion wrapper
# (`cast(doc_id#12L as bigint) IN (...)` — Spark upcasts the column
# when the IN-list literals are a narrower type), which the optional
# `as <type>)` group absorbs.
_BOUNDED_FILTER = re.compile(
    r"Filter .*(?:%s)#\d+L?(?:\s+as\s+\w+\))?(?:\)|\s)*\s(?:IN \(|<=? |= )"
    % "|".join(_SCALED_SIGNATURES)
)


def _node_depth(line: str) -> int:
    """Start offset of the node name in a Spark plan tree line — the
    tree prefix is drawn from ':', ' ', '+', '-'."""
    m = re.match(r"^[:\s+\-]*", line)
    return m.end()


def _broadcast_scaled_findings(df: DataFrame) -> list[Finding]:
    findings: list[Finding] = []
    lines = analyzed_plan(df).splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        depth = _node_depth(line)
        subtree: list[tuple[int, str]] = []
        for child in lines[i + 1 :]:
            d = _node_depth(child)
            if d <= depth:
                break
            subtree.append((d, child))
        # Evaluate boundedness PER scaled Relation leaf: the bounding
        # node must sit on the path hint -> that leaf. An any() over
        # the whole subtree let an Aggregate/Limit on one branch of a
        # join whitewash an unbounded SF-scaled scan on the other —
        # a false negative for exactly the OOM this rule exists for.
        for j, (dleaf, ln) in enumerate(subtree):
            if "Relation" not in ln:
                continue
            hit = next(
                (sig for sig in _SCALED_SIGNATURES if f"{sig}#" in ln), None
            )
            if hit is None:
                continue
            # ancestor chain = upward walk with strictly decreasing
            # tree depth (siblings' subtrees in between are skipped)
            bounded = False
            d = dleaf
            for da, anc in reversed(subtree[:j]):
                if da >= d:
                    continue
                d = da
                if any(node in anc for node in _BOUNDING_NODES) or (
                    "Filter" in anc and _BOUNDED_FILTER.search(anc)
                ):
                    bounded = True
                    break
            if not bounded:
                findings.append(
                    Finding(
                        "BROADCAST_SCALED",
                        f"forced broadcast hint over SF-scaled scan ({hit} "
                        "table) with no bounding Aggregate/Limit/Filter "
                        "on its path — OOMs at cluster scale; use "
                        "dim_join (un-hinted, AQE-sized) instead",
                    )
                )
    return findings


@dataclass(frozen=True)
class Finding:
    code: str
    detail: str


def _strip_null_guards(cond: str) -> str:
    """Remove isnotnull(...)/isnull(...) terms (balanced parens —
    guards wrap casts, e.g. isnotnull(cast(ts#55 as timestamp)))."""
    out = []
    i = 0
    while i < len(cond):
        m = re.match(r"isnotnull\(|isnull\(", cond[i:])
        if not m:
            out.append(cond[i])
            i += 1
            continue
        j, depth = i + m.end(), 1
        while j < len(cond) and depth:
            depth += cond[j] == "("
            depth -= cond[j] == ")"
            j += 1
        i = j
    return "".join(out)


def _windowspec_args(plan: str) -> list[str]:
    """Balanced-paren extraction of every windowspecdefinition(...)
    argument string (specs nest parens arbitrarily, e.g.
    unboundedpreceding$())."""
    out = []
    marker = "windowspecdefinition("
    i = plan.find(marker)
    while i != -1:
        j, depth = i + len(marker), 1
        while j < len(plan) and depth:
            depth += plan[j] == "("
            depth -= plan[j] == ")"
            j += 1
        out.append(plan[i + len(marker) : j - 1])
        i = plan.find(marker, j)
    return out


def _scan_columns(plan: str) -> list[list[str]]:
    """Column name lists of each scan's ReadSchema."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":", 1)[0].strip()
            for c in m.group(1).split(",")
            if ":" in c
        ]
        out.append(cols)
    return out


def advise(df: DataFrame, max_scan_cols: int = 24) -> list[Finding]:
    plan = formatted_plan(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding("CARTESIAN", "CartesianProduct in plan — missing join key?")
        )

    # Global (partition-less) windows: a windowspecdefinition whose
    # argument list has no partition column (every arg is an ORDER BY
    # spec or the frame) forces Exchange SinglePartition — one task.
    # Heuristic scope: flag only when NO aggregate exists in the plan;
    # windows over pre-aggregated tiny relations (share-of-total,
    # day-grain analytics) are the documented legitimate use.
    if "HashAggregate" not in plan and "SortAggregate" not in plan:
        for spec in _windowspec_args(plan):
            args, depth, cur = [], 0, ""
            for ch in spec:
                if ch == "," and depth == 0:
                    args.append(cur.strip())
                    cur = ""
                    continue
                depth += ch == "("
                depth -= ch == ")"
                cur += ch
            args.append(cur.strip())
            partition_cols = [
                a
                for a in args
                if a
                and " ASC" not in a
                and " DESC" not in a
                and not a.startswith("specifiedwindowframe")
            ]
            if not partition_cols:
                findings.append(
                    Finding(
                        "GLOBAL_WINDOW",
                        "partition-less window over non-aggregated input "
                        "— all rows to one task",
                    )
                )
                break

    # Pushdown misses: a Filter condition that (a) compares against a
    # literal, (b) references ONLY columns that come straight off a
    # scan (aggregate/window aliases like sum_qty#25 are post-shuffle
    # by nature — filtering them is HAVING, not a miss), and (c) whose
    # columns appear in no scan's substantive PushedFilters. Derived
    # isnotnull guards are stripped first; they push trivially and
    # prove nothing.
    scan_cols = {c for cols in _scan_columns(plan) for c in cols}
    pushed_cols = set()
    for lst in re.findall(r"PushedFilters: \[([^\]]*)\]", plan):
        for part in lst.split(","):
            part = part.strip()
            if part and not part.startswith("IsNotNull"):
                m = re.search(r"\(([A-Za-z_]\w*)", part)
                if m:
                    pushed_cols.add(m.group(1))
    for m in re.finditer(r"Condition : (.+)", plan):
        residual = _strip_null_guards(m.group(1))
        refs = set(re.findall(r"([A-Za-z_]\w*)#\d+", residual))
        has_literal = re.search(r"[=<>]\s*-?\d|\bIN \(|LIKE ", residual)
        if (
            refs
            and has_literal
            and refs <= scan_cols
            and not refs & pushed_cols
        ):
            findings.append(
                Finding(
                    "NO_PUSHDOWN",
                    f"filter on scan columns {sorted(refs)} compares "
                    "against literals but reached no scan's "
                    "PushedFilters — predicate shape not scan-eligible?",
                )
            )
            break

    for cols in _scan_columns(plan):
        if len(cols) > max_scan_cols:
            findings.append(
                Finding(
                    "WIDE_SCAN",
                    f"scan reads {len(cols)} columns — column pruning "
                    "lost (select earlier)",
                )
            )

    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "ROW_PYTHON_UDF",
                "row-at-a-time Python UDF in plan — use JVM exprs or "
                "a pandas UDF (Arrow)",
            )
        )

    findings.extend(_broadcast_scaled_findings(df))

    return findings


def assert_clean(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise if advise() finds anything not explicitly allowed —
    the CI gate form."""
    bad = [f for f in advise(df) if f.code not in allow]
    if bad:
        raise AssertionError(
            "plan advisor findings: "
            + "; ".join(f"{f.code}: {f.detail}" for f in bad)
        )

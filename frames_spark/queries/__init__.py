"""Query registry package: SURVEY.md §2 key -> (spark, sf_dir) ->
DataFrame, plus the DuckDB oracle SQL for each key.

Split into nine parts (~2.3k lines each) (r8; the single module had grown to
~18k lines). Parts chain lexically — q09 imports q08 imports ... q01 —
so importing the LAST part executes every ``@register`` in the
original source order; the externally-visible registration order is
then fixed by the literal manifest (frames_spark/registry_order.py),
NOT import side-effect order. Every name the old module exported
(QUERIES, ORACLES, q_* callables, _-prefixed test helpers) is
re-exported here, so ``from frames_spark.queries import X`` is
unchanged for every existing importer.
"""

from __future__ import annotations

import frames_spark.queries.q09_privacy as _last

globals().update(
    {k: v for k, v in vars(_last).items() if not k.startswith("__")}
)
del _last

from frames_spark.registry_order import REGISTRATION_ORDER as _ORDER  # noqa: E402


def _apply_manifest() -> None:
    got, want = set(QUERIES), set(_ORDER)  # noqa: F821
    if got != want:
        missing = sorted(want - got)
        unlisted = sorted(got - want)
        raise RuntimeError(
            f"registration manifest drift: missing={missing} unlisted={unlisted}"
        )
    ordered = {name: QUERIES[name] for name in _ORDER}  # noqa: F821
    QUERIES.clear()  # noqa: F821
    QUERIES.update(ordered)  # noqa: F821


_apply_manifest()

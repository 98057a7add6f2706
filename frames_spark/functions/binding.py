"""Let-binding for SQL higher-order-function expressions.

Interpreted HOF evaluation (Spark evaluates lambda bodies per element
with NO cross-invocation hoisting, and a Column expression referenced
k times in one projection is COPIED k times) re-runs any non-trivial
subexpression captured by a lambda — or referenced more than once —
once PER reference PER invocation. Measured r15: an unbound
`slice(<tokenize expr>, i, 8)` inside a span transform re-tokenized
the document once per span index (q_boilerplate 4.6 → 1.7 s cold when
bound), and the Gopher battery dropped 3.5 → 0.8 s when its sorted
gram arrays and window builds were bound.

``let(col, f)`` is the binding construct: a transform over a
one-element array (SQL HOFs' only binding form — the table_buckets
precedent) evaluates ``col`` exactly once per row and hands ``f`` a
bound lambda variable, reads of which are O(1).

Rules of thumb:
- Bind anything a lambda body captures from outside unless it is a
  plain column reference or literal.
- Bind anything expensive referenced more than once in one
  expression tree (e.g. through `_round_div_micros`-style helpers
  that mention their argument twice).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let"]


def let(col: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row and return ``f(bound_ref)``."""
    return F.element_at(F.transform(F.array(col), f), 1)

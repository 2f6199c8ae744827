"""Cross-engine integer arithmetic helpers.

The repo's oracle-portability contract leans on one identity: Spark's
``div``, DuckDB's ``//``, and these helpers all truncate TOWARD ZERO.
Python's ``//`` FLOORS (differs on negatives), so driver-side model-state
math (classifier weight updates, skew thresholds) must route through
:func:`trunc_div` to replay bit-for-bit against either engine.
"""

from __future__ import annotations


def trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division; raises on b == 0 (a silent
    passthrough would mask a misconfigured caller as a valid answer)."""
    if b == 0:
        raise ZeroDivisionError("trunc_div by zero")
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q

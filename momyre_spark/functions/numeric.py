"""Cross-engine-deterministic numeric helpers.

``round(x, d)`` is NOT portable between engines: Spark rounds the shortest
decimal string of the double (HALF_UP on BigDecimal.valueOf), DuckDB rounds
the binary value — they disagree on values like 0.60225. ``round_half_up``
instead uses the closed-form ``floor(x*10^d + 0.5)/10^d``, which both engines
evaluate with identical IEEE semantics. The SQL twin is ``ROUND4_SQL``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int = 4) -> Column:
    m = 10**digits
    return F.floor(col * m + F.lit(0.5)) / F.lit(float(m))


def round4_sql(expr: str) -> str:
    """DuckDB twin of round_half_up(col, 4)."""
    return f"floor(({expr}) * 10000 + 0.5) / 10000.0"

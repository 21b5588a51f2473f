"""Cross-engine deterministic rounding.

``round(double, n)`` is NOT portable: Spark rounds HALF_UP on the shortest
decimal representation while DuckDB rounds on the binary value, so values
whose decimal expansion sits on the .xx5 boundary disagree (observed at
sf0.01: 36639.505 → 36639.51 vs 36639.50). Both engines DO agree bit-for-bit
on IEEE-754 multiply/add/floor/divide, so the engine-neutral rounding used
everywhere (Spark side and oracle SQL side) is::

    floor(x * 10^n + 0.5) / 10^n

Half-values round toward +infinity on both engines, and identical inputs
give identical doubles. (SURVEY.md §7.3b — oracle parity for doubles.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(col: str | Column, n: int = 2) -> Column:
    """Engine-portable round-half-up to ``n`` decimals (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    p = 10**n
    return F.floor(c * p + F.lit(0.5)) / p


def sql_hround(expr: str, n: int = 2) -> str:
    """Engine-portable round-half-up to ``n`` decimals (DuckDB SQL side)."""
    p = 10**n
    return f"floor(({expr}) * {p} + 0.5) / {p}"

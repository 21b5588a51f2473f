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


def cents_sum(col: str | Column) -> Column:
    """Engine-deterministic money sum: per-row cent quantization summed
    as exact integers, returned as a double amount.

    ``hround(F.sum(x), 2)`` is only deterministic while the double sum's
    fold-order noise stays below the cent digit; at corpus-scale groups
    it does not (round-12 sf10 parity: TPC-H q1's ~5e11 sums over 15M
    rows/group flipped the cent between Spark and DuckDB — 1 ulp there
    is 6e-5). ``floor(x*100+0.5)`` per row is bit-identical on both
    engines (same IEEE product), the LONG sum is exact, and the final
    divide derives from the same integer, so the result is
    engine-deterministic at any group size (< 2^53 cents ≈ 9e13 — one
    group would need ~450 years of total TPC-H revenue to overflow).
    Semantics: "sum of per-row cent-rounded amounts" — lossless for
    2dp-exact money columns. SQL twin: :func:`sql_cents_sum`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * 100 + F.lit(0.5)).cast("long")).cast(
        "double"
    ) / 100


def sql_cents_sum(expr: str) -> str:
    """DuckDB/ANSI twin of :func:`cents_sum` (identical arithmetic)."""
    return (
        f"CAST(sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) "
        "AS DOUBLE) / 100"
    )

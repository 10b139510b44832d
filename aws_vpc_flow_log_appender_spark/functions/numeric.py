"""Cross-engine deterministic numeric helpers.

``round()`` differs between engines at representation boundaries (Spark uses
BigDecimal HALF_UP on the exact binary value; DuckDB scales in floating
point) — ~0.2% of row-level roundings disagree by one ulp of the last kept
digit. ``floor(x * 10^n + 0.5) / 10^n`` is the same IEEE op sequence in both
engines, so results match bit-for-bit when inputs do. Used on BOTH sides of
every oracle-checked query (the Spark expression here, the SQL twin via
:func:`sql_round`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int) -> Column:
    """Deterministic round-half-up-toward-+inf to ``n`` decimal places."""
    scale = float(10 ** n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_round(expr: str, n: int) -> str:
    """The DuckDB twin of :func:`round_half_up` as a SQL fragment."""
    scale = float(10 ** n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def fdiv_sql(x: str, n: str) -> str:
    """Python-style FLOOR division as a DuckDB fragment (``n`` > 0).

    DuckDB's ``//`` truncates toward zero on negatives (``-7 // 2 = -3``)
    where Python floors (``-4``); the exact integer identity
    ``(x - ((x % n) + n) % n) // n`` floors without any float detour, so
    scaled-integer recurrences replayed in SQL match the engine's Python
    kernels bit-for-bit."""
    return f"((({x}) - (((({x}) % ({n})) + ({n})) % ({n}))) // ({n}))"

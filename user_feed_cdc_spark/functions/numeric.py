"""Cross-engine-stable numeric helpers.

Engine-native ROUND(double) differs between Spark (BigDecimal HALF_UP on
the decimal rendering) and DuckDB (scaled std::round) exactly at .5
boundaries, which breaks value-hash parity on per-row computed columns.
``floor(x * 10^n + 0.5) / 10^n`` uses only IEEE-deterministic double ops,
so both engines produce bit-identical results. Use these for any rounded
PER-ROW output that an oracle will hash; plain F.round is fine for
display-only use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col, scale: int = 2) -> Column:
    factor = float(10**scale)
    return F.floor(col * factor + F.lit(0.5)) / factor


def sql_round_half_up(expr: str, scale: int = 2) -> str:
    factor = float(10**scale)
    return f"FLOOR(({expr}) * {factor} + 0.5) / {factor}"


def py_round_half_up(x: float, scale: int = 2) -> float:
    """Driver-side twin of round_half_up: identical IEEE operation
    sequence (x*10^n, +0.5, floor, /10^n), so a value rounded on the
    driver equals the same value rounded in an executor or the oracle."""
    import math

    factor = float(10**scale)
    return math.floor(x * factor + 0.5) / factor

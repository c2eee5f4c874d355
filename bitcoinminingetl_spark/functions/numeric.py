"""Deterministic numeric output shaping.

The reference formats averages with f"{avg:.2f}" (load.py:52-53). Rounding
a raw double to 2 dp is engine-dependent exactly at representation
boundaries (x.xx4999... vs x.xx5), so Spark's HALF_UP and DuckDB's round
can disagree by one ulp-driven cent. Routing through DECIMAL(18,6) first
pins the value to a canonical 6-dp decimal before the 2-dp round — both
engines then agree. Output is cast back to double so result schemas stay
decimal-free (stable across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(col: Column) -> Column:
    """2-dp engine-stable rounding of a double expression (Spark side)."""
    return F.round(col.cast("decimal(18,6)"), 2).cast("double")


def round2_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`round2`."""
    return f"CAST(round(CAST(({expr}) AS DECIMAL(18,6)), 2) AS DOUBLE)"


def roundn(col: Column, n: int) -> Column:
    """n-dp engine-stable rounding (similarity scores etc.)."""
    return F.round(col.cast("decimal(28,12)"), n).cast("double")


def roundn_sql(expr: str, n: int) -> str:
    return f"CAST(round(CAST(({expr}) AS DECIMAL(28,12)), {n}) AS DOUBLE)"

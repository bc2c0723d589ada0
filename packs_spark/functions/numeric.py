"""Numeric-validation Column expressions.

Covers the reference numeric-validation and accuracy packs
(``/root/reference/numeric_validation_pack/main.py:20-60``,
``/root/reference/accuracy_pack/main.py:39-129``) as single-pass Spark
aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def below_min(c: Column, lo) -> Column:
    return F.sum(F.coalesce((c < F.lit(lo)).cast("long"), F.lit(0)))


def above_max(c: Column, hi) -> Column:
    return F.sum(F.coalesce((c > F.lit(hi)).cast("long"), F.lit(0)))


def in_range_percent(c: Column, lo=None, hi=None, ndigits: int = 4) -> Column:
    """share of non-null values inside [lo, hi], rounded like the reference
    (numeric_validation_pack/main.py:55 rounds to 4)."""
    n = F.count(c)
    bad = F.lit(0)
    if lo is not None:
        bad = bad + F.sum(F.coalesce((c < F.lit(lo)).cast("long"), F.lit(0)))
    if hi is not None:
        bad = bad + F.sum(F.coalesce((c > F.lit(hi)).cast("long"), F.lit(0)))
    return F.round(
        F.when(n == 0, F.lit(1.0)).otherwise((n - bad) / n), ndigits
    )


def negative_count(c: Column) -> Column:
    return F.sum(F.coalesce((c < 0).cast("long"), F.lit(0)))


def is_valid_latitude(c: Column) -> Column:
    return c.between(-90, 90)


def is_valid_longitude(c: Column) -> Column:
    return c.between(-180, 180)


def decimal_digits(c: Column, max_digits: int = 6) -> Column:
    """Digits after the decimal point of a float value, computed
    arithmetically (no string formatting, whose rendering differs between
    engines).  Returns the smallest d in [0, max_digits] such that
    ``round(x, d) == x`` up to double noise; mirrors the reference's
    string-split digit count (accuracy_pack/main.py:49-61) for values that
    were printed with that many decimals.
    """
    x = c.cast("double")
    expr = F.lit(max_digits)
    for d in range(max_digits - 1, -1, -1):
        scaled = x * F.lit(float(10**d))
        is_exact = F.abs(scaled - F.round(scaled, 0)) < F.lit(1e-6)
        expr = F.when(is_exact, F.lit(d)).otherwise(expr)
    return expr


def decimal_digits_sql(col: str, max_digits: int = 6) -> str:
    """ANSI-SQL rendering of :func:`decimal_digits` for the DuckDB oracle."""
    expr = str(max_digits)
    for d in range(max_digits - 1, -1, -1):
        scaled = f"(CAST({col} AS DOUBLE) * {float(10 ** d)!r})"
        expr = f"CASE WHEN abs({scaled} - round({scaled}, 0)) < 1e-6 THEN {d} ELSE {expr} END"
    return expr

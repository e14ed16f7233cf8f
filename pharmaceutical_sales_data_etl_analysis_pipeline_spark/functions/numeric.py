"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; on a cluster the reduction order is
nondeterministic across partitions, so two runs (or two engines) can differ
in the last ulp. Money-style aggregates therefore sum in DECIMAL (exact,
order-independent) and cast the final result to DOUBLE — bit-identical
across engines and cluster layouts, and still whole-stage-codegen'd JVM-side.

The reference stores money as REAL and relies on single-threaded summation
order (LoadDataWarehouse.ChatterjeeP.R:97,126); DECIMAL summation is the
scale-safe equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18,2 holds |x| < 10^16 cents-precision money; the SUM accumulator widens
# to (28,2)/(38,2) automatically in Spark/DuckDB.
MONEY_DECIMAL = "decimal(18,2)"


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact, order-independent SUM for money columns, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY_DECIMAL)).cast("double").alias(alias)


def money_sum_sql(expr: str, alias: str) -> str:
    """DuckDB/ANSI twin of money_sum (same rounding, same result bits)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def bigint_sum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("long")).cast("long").alias(alias)


def round_half_up(col: Column, digits: int) -> Column:
    """Engine-portable rounding: floor(x*10^d + 0.5)/10^d.

    Spark's round() is HALF_UP but DuckDB's is half-even; ratio columns hit
    exact .5 ties constantly (rational values with power-of-10-friendly
    denominators), so both sides must use this same floor construction.
    """
    m = float(10 ** digits)
    return F.floor(col * m + F.lit(0.5)) / m


def round_half_up_sql(expr: str, digits: int) -> str:
    m = float(10 ** digits)
    return f"floor(({expr}) * {m} + 0.5) / {m}"

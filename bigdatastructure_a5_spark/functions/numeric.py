"""Deterministic numeric aggregation expressions.

Why these exist: floating-point SUM/AVG are *order-dependent*; Spark's
distributed partial aggregation and DuckDB's sequential scan accumulate in
different orders, so ``SUM(double_col)`` can differ in the last ulps between
the two engines and break the driver's value-hash correctness gate.

The fix is exact arithmetic in the aggregate: cast each row's value to a
DECIMAL *before* summing (decimal addition is associative/exact), then cast
the exact result to DOUBLE (a single deterministic conversion).  Division by
an exact integer count is a single IEEE-754 operation, also deterministic.
The matching oracle SQL uses the same construction, e.g.::

    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)          -- dec_sum_double
    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)  -- det_avg

Scale note: decimal aggregation stays inside Spark's Tungsten/WholeStageCodegen
path (no UDF), so this costs almost nothing at 100 TB while buying exact,
reproducible results — the same trick production pipelines use for money math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec_sum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact SUM via per-row decimal cast. Result is DecimalType."""
    return F.sum(_as_col(col).cast(f"decimal({precision},{scale})"))


def dec_sum_double(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact SUM, returned as a deterministic DOUBLE (stable cross-engine)."""
    return dec_sum(col, precision, scale).cast("double")


def det_avg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Deterministic AVG = exact-sum-as-double / count(col).

    Not the builtin ``avg`` (engines implement it with order-dependent double
    accumulation); this is bit-reproducible across engines.
    """
    c = _as_col(col)
    return dec_sum_double(c, precision, scale) / F.count(c)

"""Stream-stream interval join: the watermarked two-sided stateful join.

Beyond reference scope (the reference has no streaming at all — SURVEY.md
§1.1); this is the streaming twin of ``operators.joins.range_join``.  Spark
executes it as a symmetric hash join where BOTH sides buffer state; the
watermarks plus the time-range join condition are what let the state store
evict rows — without them state grows without bound.  At 100 TB/day this
eviction bound is the difference between a runnable job and an OOM.

Semantics parity: ``stream_interval_join(errors, clicks, low, high)``
produces exactly the pairs of the batch ``range_join`` with the same
bounds (pytest asserts equality on the fixture), because AvailableNow over
a finite source delivers no late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    low_seconds: int,
    high_seconds: int,
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join two STREAMING DataFrames on key equality + a time range:
    ``right_time ∈ [left_time + low_seconds, left_time + high_seconds]``.

    Both sides get event-time watermarks; the range condition bounds each
    side's buffered state to ``watermark + |interval|`` of data.  Column
    names match the batch twin exactly: left columns keep their names,
    right's time arrives as ``r_<right_time>`` and other right columns
    prefixed ``r_`` — a hardcoded ``r_ts`` would both break the declared
    range_join parity for any non-default ``right_time`` and collide with
    a right column literally named ``ts``.
    """
    lt, rt = "__lt", "__rt"
    lw = left.withColumn(lt, F.col(left_time)).withWatermark(lt, watermark)
    rw = right.select(
        F.col(on).alias("__rk"),
        F.col(right_time).alias(rt),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_time)
        ],
    ).withWatermark(rt, watermark)
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(rt) >= F.col(lt) + F.expr(f"INTERVAL {low_seconds} SECOND"))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {high_seconds} SECOND"))
    )
    joined = lw.join(rw, cond, "inner")
    return joined.withColumnRenamed(rt, f"r_{right_time}").drop(lt, "__rk")

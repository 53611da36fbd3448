"""Sharding/partitioning diagnostics (reference O26) + CBO estimate access
(reference O18/O25 duality).

The reference prints avg docs/server and avg distinct shard-key values per
server from closed-form stats (`/root/reference/main.py:141-166`); here the
same diagnostics come from the actual partitions of a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_stats(df: DataFrame, key: str | None = None) -> DataFrame:
    """Per-partition row counts (and distinct ``key`` values if given) —
    the real version of the reference's docs-per-server table.  Use after a
    ``repartition(key)`` to see skew; a hot key shows up as one fat row."""
    g = df.withColumn("__pid", F.spark_partition_id()).groupBy("__pid")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key is not None:
        aggs.append(F.countDistinct(key).alias("n_distinct_keys"))
    return g.agg(*aggs).withColumnRenamed("__pid", "partition_id")


def skew_summary(df: DataFrame, key: str | None = None) -> dict[str, float]:
    """Driver-side summary: partitions, min/avg/max rows, skew ratio
    (max/avg — >2 suggests salting or AQE skew-join handling at scale)."""
    rows = partition_stats(df, key).collect()
    counts = [r.n_rows for r in rows] or [0]
    avg = sum(counts) / len(counts)
    return {
        "partitions": float(len(counts)),
        "min_rows": float(min(counts)),
        "avg_rows": avg,
        "max_rows": float(max(counts)),
        "skew_ratio": (max(counts) / avg) if avg else 0.0,
    }

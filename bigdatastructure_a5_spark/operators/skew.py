"""Skew mitigation: salted joins and salted aggregation.

The reference's cost model has no notion of skew (every shard holds
``nb_documents / nb_servers`` uniformly — `main.py:141-166`); real clusters
are not so lucky.  AQE's skew-join splitting (enabled in session.py) handles
most cases at runtime; explicit salting remains the tool when one key
dominates so hard that even split partitions overwhelm a task, or for
aggregations (AQE does not salt aggregates).

Pattern: spread the hot side over ``salt`` sub-keys, replicate the small
side to every sub-key, join on (key, salt).  Aggregations: two-phase —
partial by (key, salt), final by key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a small table on ``key`` with ``salt``-way key
    spreading.  The small side is exploded x salt (fine: it's small — this
    is a targeted broadcast-amplification trade) so every salted fact row
    finds its partner without a hot partition.

    Only inner/left are supported: the salt replication is result-invariant
    for them, but a right/full join would emit an unmatched small-side row
    once PER SALT (salt copies of it survive the join)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (salt replication "
            f"multiplies unmatched small-side rows under {how!r})"
        )
    salted_fact = skewed.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_fact.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt: int = 16,
    precision: int = 18,
    scale: int = 2,
) -> DataFrame:
    """Two-phase salted SUM/COUNT aggregation: partial groupBy (keys, salt)
    then final groupBy (keys).  Useful when a single group receives a large
    share of all rows — the partial phase spreads that group over ``salt``
    reducers.  (Spark's map-side partial aggregation already does this when
    mapper-local data contains the hot key; explicit salting also covers the
    reduce side.)  Produces sum_<col> and n_rows columns.  Sums go through
    functions.numeric.dec_sum (the centralized exact-decimal-sum rule), with
    the precision/scale knobs exposed for wide-valued columns."""
    from bigdatastructure_a5_spark.functions.numeric import dec_sum

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            dec_sum(c, precision, scale).alias(f"__s_{c}")
            for c in sum_cols
        ],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[
            F.sum(f"__s_{c}").cast("double").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )

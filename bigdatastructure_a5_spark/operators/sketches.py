"""Bounded-memory frequency sketches: Count-Min (Cormode & Muthukrishnan
2005).

Beyond reference scope (the brief's 'novel sketch' custom-operator class).
The 100 TB story: exact per-key counts need state proportional to the key
cardinality; a Count-Min sketch is ``depth x width`` cells NO MATTER the
input — the sketch build is a map-side partial aggregation whose shuffle
carries at most ``depth x width`` rows per partition, and estimation joins
a broadcast-sized table.  Guarantees: estimate >= true count always
(one-sided error); estimate <= true + eN with probability 1 - (1/2)^depth
for e = e/width.

Cross-engine determinism: the row/cell hash is the first 8 hex chars of
md5 parsed as an integer — Spark ``conv(substring(md5(..),1,8),16,10)``
and DuckDB ``CAST('0x' || SUBSTR(MD5(..),1,8) AS BIGINT)`` produce the
same 32-bit value, so the sketch (and every estimate) hash-matches the
SQL oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, d: int, width: int) -> Column:
    """Depth-``d`` cell index for ``key`` (stringified): 32-bit md5 prefix
    mod width — identical arithmetic in DuckDB for the oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(d)), F.lit(":"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def countmin_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (d, cell, cnt) with exactly one row per touched
    cell (<= depth x width rows total, any input size).

    NULL keys are OUTSIDE the sketch domain (filtered here, and from the
    probe side in countmin_estimate): a NULL hashes to a NULL cell, which
    the estimate's equi-join can never match, so keeping them would store
    counts no probe can reach and hand a NULL probe est=0 below its true
    count — silently breaking the one-sided `estimate >= truth` guarantee.
    Excluding NULL on both sides keeps the guarantee exact over the whole
    (non-NULL) domain, mirroring how COUNT(col) treats NULLs."""
    key = F.col(key_col)
    cells = df.filter(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell(key, d, width).alias("cell")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc")
    ).select("dc.d", "dc.cell")
    return cells.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each key's frequency: min over depths of its cell counts.

    LEFT join + coalesce(0) on purpose: a probe key the build input never
    touched can have untouched cells, and the canonical Count-Min answer
    for it is min(..., 0) = 0 — an inner join would either drop the key
    from the output entirely (all cells untouched) or min over only its
    COLLIDING cells (a strictly positive wrong estimate).  For keys that
    appeared in the build input every cell is populated, so their
    estimates are unchanged.

    Extra columns on ``keys`` are carried through to the output (they ride
    the explode and become additional group keys — they must be PER-KEY
    CONSTANTS, e.g. the columns of an aggregate keyed on ``key_col``;
    non-constant extras would split one key's estimate into one row per
    distinct combination).  That lets a caller probe with an aggregate it
    already has (e.g. exact counts) WITHOUT referencing that aggregate
    twice in the DAG: a second reference is not deduplicated by Catalyst
    once column pruning specializes the copies, and costs a second scan of
    the fact table."""
    key = F.col(key_col)
    keys = keys.filter(key.isNotNull())  # NULL is outside the sketch domain
    passthrough = [c for c in keys.columns if c != key_col]
    # checked against ALL probe columns including key_col itself — a key
    # named 'd'/'cell' would duplicate the exploded probe struct's columns
    clash = {"d", "cell", "cnt", "est"}.intersection(keys.columns)
    if clash:
        # 'd'/'cell' collide with the exploded probe struct, 'cnt' with the
        # sketch's count column (the coalesce below would be ambiguous),
        # 'est' with the output — loud beats a confusing analysis error
        raise ValueError(
            f"countmin_estimate probe columns {sorted(clash)} collide with "
            "the sketch's internal names (d, cell, cnt, est); rename them "
            "before probing"
        )
    kc = keys.select(
        *keys.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell(key, d, width).alias("cell")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc"),
    ).select(*keys.columns, "dc.d", "dc.cell")
    return (
        kc.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key_col, *passthrough)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )

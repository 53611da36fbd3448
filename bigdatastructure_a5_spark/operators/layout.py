"""Data-layout clustering: Z-order (Morton) keys for multi-column pruning.

The storage-layout counterpart of the reference's physical-design thesis
(reference: challenge/simulator.py scan costing — which layout a query
reads decides its cost): at 100 TB, a predicate only gets cheap if the
layout lets the scan SKIP data.  A single sort column gives parquet
min/max row-group skipping on that one column; a query filtering on TWO
columns reads almost everything on a one-column sort.  Z-ordering
interleaves the bits of several columns' rank values into one Morton key
and range-clusters by it, so every participating column is locally
ordered inside each file and min/max pruning works on all of them at
once — the same technique behind Delta Lake's OPTIMIZE ZORDER BY and
ClickHouse/DuckDB morton encodings (public knowledge; OSS Spark has no
built-in, which is why this operator exists).

Spark-first: the Morton key is a RENDERED COLUMN EXPRESSION (shiftleft /
shiftright / bitwise and-or over the scaled ranks — zero Python, stays
inside whole-stage codegen, same design rule as the IVF SQL argmax), and
the clustering is `repartitionByRange(z) + sortWithinPartitions(z)` +
plain parquet write: every engine that reads parquet footers benefits,
no table format required.  Measured in EXPERIMENTS §15
(tools/layout_experiment.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per column in the Morton key — up to 3 columns at 16
#: bits fit the signed 64-bit key (with_zorder_key auto-shrinks to
#: 63 // n_cols beyond that: 4 columns -> 15 bits each).  65k distinct
#: rank buckets per column is far finer than row-group granularity at
#: any realistic file size, so more bits buy nothing (the key only
#: needs to ORDER row groups, not rows).
ZORDER_BITS = 16


def scale_to_rank(
    col: Column, lo: float, hi: float, bits: int = ZORDER_BITS
) -> Column:
    """Min/max-scale a numeric column to an integer rank in [0, 2^bits):
    the per-column input to the Morton interleave.  ``lo``/``hi`` are the
    column's corpus min/max (one tiny agg job, computed once at write
    time by the caller — layout building is a write-time activity, like
    the IVF cell assignment).  NULLs rank 0 (they cluster together at
    the low end, which is exactly what a pruning layout wants).

    A degenerate column (lo == hi) ranks 0 everywhere instead of
    dividing by zero."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("bigint")
    max_rank = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * max_rank
    ).cast("bigint")
    # clamp: float rounding at the top edge can land exactly on 2^bits
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(max_rank)),
        F.lit(0),
    )


def morton_interleave(
    ranks: list[Column], bits: int = ZORDER_BITS
) -> Column:
    """Bit-interleave ``len(ranks)`` rank columns into one Morton key:
    output bit (i * n + j) is input j's bit i — a rendered expression of
    shift/and/or terms (2 cols x 16 bits = 32 terms), zero Python.

    Locality property this buys: points close in EVERY dimension are
    close in the key, so a range-clustered layout gives each file a
    small min/max box in all dimensions at once."""
    n = len(ranks)
    if n == 0:
        raise ValueError("morton_interleave: need at least one rank column")
    if n * bits > 63:
        raise ValueError(
            f"morton_interleave: {n} cols x {bits} bits exceeds a signed "
            "64-bit key"
        )
    out = F.lit(0).cast("bigint")
    for j, r in enumerate(ranks):
        for i in range(bits):
            # ((r >> i) & 1) << (i * n + j)
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j
                ).cast("bigint")
            )
    return out


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]] | None = None,
    key_col: str = "__z",
    bits: int | None = None,
) -> DataFrame:
    """Add the Morton key for ``cols``.  ``bounds`` maps column -> (min,
    max); None computes them with one agg job (write-time cost).
    ``bits=None`` uses ZORDER_BITS, auto-shrunk to ``63 // len(cols)``
    when the default would overflow the signed 64-bit key (4+ columns) —
    an explicit ``bits`` that overflows still raises in
    morton_interleave.

    Column types: numerics rank directly; DATE ranks as days since epoch
    (``unix_date``) and TIMESTAMP as microseconds (``unix_micros``) —
    caller-supplied ``bounds`` for those columns are in the same units.
    STRING columns raise: an order-preserving rank needs a dictionary
    pre-pass (distinct -> dense rank -> join) whose cost/benefit is a
    caller decision — rank it to an integer column first, or make the
    string the coarse ``partitionBy`` key and Z-order the residual
    columns (the §15b composition)."""
    from pyspark.sql.types import DateType, StringType, TimestampType

    if bits is None:
        bits = min(ZORDER_BITS, 63 // max(len(cols), 1))
    by_name = {f.name: f.dataType for f in df.schema.fields}
    exprs: dict[str, Column] = {}
    for c in cols:
        dt = by_name.get(c)
        if isinstance(dt, StringType):
            raise ValueError(
                f"with_zorder_key: column {c!r} is a string — rank it to "
                "an integer first (dictionary pre-pass) or use it as the "
                "partitionBy key and Z-order the other columns"
            )
        if isinstance(dt, DateType):
            exprs[c] = F.unix_date(F.col(c))
        elif isinstance(dt, TimestampType):
            exprs[c] = F.unix_micros(F.col(c))
        else:
            exprs[c] = F.col(c)
    if bounds is None:
        agg = df.agg(
            *[F.min(exprs[c]).alias(f"lo_{c}") for c in cols],
            *[F.max(exprs[c]).alias(f"hi_{c}") for c in cols],
        ).first()
        bounds = {
            c: (float(agg[f"lo_{c}"]), float(agg[f"hi_{c}"])) for c in cols
        }
    ranks = [
        scale_to_rank(exprs[c], bounds[c][0], bounds[c][1], bits)
        for c in cols
    ]
    return df.withColumn(key_col, morton_interleave(ranks, bits))


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int | None = None,
) -> DataFrame:
    """Range-cluster ``df`` by the Morton key of ``cols`` into
    ``n_files`` partitions, locally sorted — write the result with plain
    ``.write.parquet`` and every footer-reading engine prunes on ALL of
    ``cols``.  The key column is dropped from the output: it exists to
    place rows, not to be stored (min/max of the real columns do the
    pruning)."""
    keyed = with_zorder_key(df, cols, bounds=bounds, bits=bits)
    return (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )

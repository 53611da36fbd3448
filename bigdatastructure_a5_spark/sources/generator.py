"""Deterministic table generation from reference schema+stats JSON.

The reference never touches data: its schema.json/stats.json DESCRIBE a
corpus (collections, field types/sizes, document counts, NDVs —
`/root/reference/challenge/schema.json`, `challenge/stats.json`) and the
simulator prices plans against those numbers.  This engine executes for
real, so the reference-format CLI needs actual tables matching the
description.  This generator builds them as pure Catalyst projections over
``spark.range`` — distributed, deterministic (xxhash64-keyed, no RNG
state), and scale-invariant: at ``scale=1`` you get the reference's
100k-product / 4M-orderline corpus; any smaller scale preserves every
ratio (counts AND NDVs shrink together, so selectivities hold).

Selectivity fidelity: an equality predicate on a field with d distinct
values selects ~1/d of rows in the reference's model
(`challenge/simulator.py` 1/NDV selectivity).  Generated values are
uniform hash buckets over exactly d values, reproducing that.  Workload
literals (e.g. ``brand = 'apple'``) are seeded into bucket 0 of their
field so the reference's own queries run with the modeled selectivity
instead of matching nothing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.sources.json_config import CollectionStats

#: unqualified `field = 'literal'` equality, e.g. p.brand = 'apple'
_EQ_LITERAL = re.compile(r"(?:\w+\.)?(\w+)\s*=\s*'([^']*)'")


def extract_equality_literals(sqls: list[str]) -> dict[str, str]:
    """String literals used in equality predicates, per (unqualified) field
    name — the values the generator must actually produce."""
    out: dict[str, str] = {}
    for sql in sqls:
        for fld, lit in _EQ_LITERAL.findall(sql):
            out.setdefault(fld, lit)
    return out


def generate_tables(
    spark: SparkSession,
    schema: dict[str, dict],
    stats: dict[str, CollectionStats],
    scale: float = 1.0,
    literals: dict[str, str] | None = None,
    partitions: int | None = None,
) -> dict[str, DataFrame]:
    """One DataFrame per collection in ``schema`` (load_flat_schema shape),
    sized/shaped per ``stats``.  Per field:

    - the primary key is the row id (dense, unique — NDV = row count, as
      the reference's stats declare for every pk);
    - integers draw uniformly from [0, ndv) via xxhash64 — a foreign key
      whose NDV equals the parent's count therefore hits every parent
      (referential integrity by construction);
    - numbers are uniform doubles with two decimals;
    - strings are ``field_<bucket>`` over ndv buckets, right-padded to the
      schema's avg_size so measured scan bytes track the reference's size
      model; bucket 0 becomes the workload literal when one is seeded
      (unpadded, so the predicate matches exactly).
    """
    literals = literals or {}
    out: dict[str, DataFrame] = {}
    for name, cspec in schema.items():
        cstats = stats.get(name, CollectionStats(0, {}, {}, {}, None))
        n = max(1, int(cstats.nb_documents * scale))
        pk = cspec.get("primary_key")
        base = spark.range(n, numPartitions=partitions)
        cols = []
        for fname, fspec in cspec.get("fields", {}).items():
            ftype = fspec.get("type", "string")
            avg = max(1, int(fspec.get("avg_size", 8)))
            ndv_raw = (cstats.distinct_values or {}).get(fname)
            ndv = max(1, int(ndv_raw * scale)) if ndv_raw else n
            h = F.xxhash64(F.lit(fname), F.col("id"))
            if fname == pk:
                col = F.col("id")
            elif ftype == "integer":
                col = F.pmod(h, F.lit(ndv))
            elif ftype == "number":
                col = (F.pmod(h, F.lit(100000)) / F.lit(100.0))
            else:
                bucket = F.pmod(h, F.lit(ndv))
                raw = F.concat(F.lit(f"{fname}_"), bucket.cast("string"))
                # pad up to avg_size for byte realism, but never TRUNCATE —
                # rpad's cut would collapse distinct buckets into one value
                # when avg_size is smaller than the generated string
                val = F.when(F.length(raw) >= avg, raw).otherwise(
                    F.rpad(raw, avg, "x")
                )
                if fname in literals:
                    val = F.when(bucket == 0, F.lit(literals[fname])).otherwise(val)
                col = val
            cols.append(col.alias(fname))
        out[name] = base.select(*cols)
    return out

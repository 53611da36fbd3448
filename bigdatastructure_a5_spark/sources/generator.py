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

#: unqualified `field = 'literal'` equality, e.g. p.brand = 'apple'.
#: The literal body admits SQL-escaped quotes ('') — without that,
#: `note = 'it''s here'` would truncate to 'it' and seed a value the
#: workload predicate can never match.
_EQ_LITERAL = re.compile(r"(?:\w+\.)?(\w+)\s*=\s*'((?:[^']|'')*)'")
#: unqualified `field = 125` numeric equality (never matches a join
#: condition — the right side must be digits, not an identifier)
_EQ_NUMERIC = re.compile(r"(?:\w+\.)?(\w+)\s*=\s*(\d+)(?!\.?\w)")


def extract_equality_literals(sqls: list[str]) -> dict[str, list[str]]:
    """ALL literals used in equality predicates, per (unqualified) field
    name — every one must exist in the generated data, so a workload with
    `brand = 'apple'` in one query and `brand = 'samsung'` in another gets
    both seeded (into buckets 0 and 1 respectively).  Numeric equality
    literals (Q2-style ``ol.IDC = 125``) are extracted too and seeded into
    the integer value space — without this they only match when NDV
    capping happens to keep the value in range."""
    out: dict[str, list[str]] = {}
    for sql in sqls:
        for fld, lit in _EQ_LITERAL.findall(sql):
            vals = out.setdefault(fld, [])
            lit = lit.replace("''", "'")  # un-escape SQL quote doubling
            if lit not in vals:
                vals.append(lit)
        # numeric extraction runs on the SQL with quoted spans blanked:
        # the pattern would otherwise match `x = 5` INSIDE a string
        # constant (e.g. note = 'priority = 5') and seed a bogus literal
        # into an unrelated field's value space
        unquoted = re.sub(r"'(?:[^']|'')*'", "''", sql)
        for fld, lit in _EQ_NUMERIC.findall(unquoted):
            vals = out.setdefault(fld, [])
            if lit not in vals:
                vals.append(lit)
    return out


def _literal_seeds(raw) -> list[int]:
    """Workload equality literals -> deduped int seeds, first-seen order —
    the SHARED extraction for a pk column and every FK referencing it, so
    both sides compose the identical mapping (that identity is what keeps
    referential integrity through seeding)."""
    seeds: list[int] = []
    for s in raw:
        if s.isdigit() and int(s) not in seeds:
            seeds.append(int(s))
    return seeds


def compose_seed_mapping(seeds: list[int], ndv: int) -> dict[int, int]:
    """Compose workload literal seeds into ONE bucket->value mapping.

    Chaining independent whens over the raw bucket lets a later literal's
    swap shadow an earlier literal's target bucket (two literals on one
    field could erase the first from the generated data entirely), so all
    seeds are composed here first and rendered as exactly one branch per
    bucket — branch order then cannot shadow.

    In-range literal i is placed at bucket i by SWAPPING with the bucket
    currently holding value i's literal, keeping the mapping a permutation
    of [0, ndv) — uniformity and (for FKs) referential integrity are
    preserved exactly.  An out-of-range literal overwrites bucket i (the
    documented ~1/ndv skew: better than the predicate matching nothing).
    Only non-identity entries are returned."""
    perm: dict[int, int] = {}

    def _holder(v: int) -> int | None:
        for b, val in perm.items():
            if val == v:
                return b
        # not remapped anywhere: at its identity bucket — unless that
        # bucket was itself overwritten (an earlier out-of-range literal),
        # in which case v is no longer emitted at all
        return None if v in perm else v

    deduped: list[int] = []
    for v in seeds:
        if v not in deduped:
            deduped.append(v)
    for i, v in enumerate(deduped[:ndv]):
        if 0 <= v < ndv:
            j = _holder(v)
            if j == i:
                continue
            if j is None:
                # v vanished under an out-of-range overwrite: placing it
                # is a plain overwrite too (same documented skew class)
                perm[i] = v
            else:
                perm[i], perm[j] = v, perm.get(i, i)
        else:
            perm[i] = v
    return {b: v for b, v in perm.items() if v != b}


def generate_tables(
    spark: SparkSession,
    schema: dict[str, dict],
    stats: dict[str, CollectionStats],
    scale: float = 1.0,
    literals: dict[str, list[str]] | None = None,
    partitions: int | None = None,
) -> dict[str, DataFrame]:
    """One DataFrame per collection in ``schema`` (load_flat_schema shape),
    sized/shaped per ``stats``.  Per field:

    - the primary key is the row id (dense, unique — NDV = row count, as
      the reference's stats declare for every pk);
    - a field that is ANOTHER collection's primary key is a foreign key:
      it draws uniformly from the parent's scaled row count, so every
      value hits a parent (referential integrity survives scaling);
    - any other field keeps its UNSCALED stats NDV (capped at the row
      count): equality selectivity is 1/NDV in the reference's cost model
      (`challenge/simulator.py`), and scaling the NDV down would inflate
      every predicate's selectivity by 1/scale — only counts shrink with
      scale, never selectivities;
    - integers draw uniformly from [0, ndv); numbers are uniform doubles
      with two decimals;
    - strings are ``field_<bucket>`` over ndv buckets, right-padded to the
      schema's avg_size so measured scan bytes track the reference's size
      model; workload literals are seeded into buckets 0, 1, ... (unpadded,
      so the predicates match exactly at ~1/NDV each).
    """
    literals = literals or {}
    # pk -> (scaled row count, declared type) of the owning collection.
    # FK values are generated from the PARENT's pk representation, never
    # from the referencing field's declared type: a string-typed pk is
    # emitted as CAST(id AS STRING), so its referencing fields must be
    # string-cast row ids too — the type branch below would instead emit
    # 'name_<bucket>' labels that join to nothing.
    pk_counts: dict[str, int] = {}
    pk_types: dict[str, str] = {}
    pk_owner: dict[str, str] = {}
    for name, cspec in schema.items():
        cstats = stats.get(name, CollectionStats(0, {}, {}, {}, None))
        pk = cspec.get("primary_key")
        if pk:
            if pk in pk_owner:
                # the FK convention is NAME-keyed (a field named like a pk
                # is an FK to that pk's collection) — two collections
                # sharing a pk name would make every such FK's parent
                # ambiguous, silently mis-wiring joins; fail loudly
                raise ValueError(
                    f"primary-key name {pk!r} is used by both "
                    f"{pk_owner[pk]!r} and {name!r}; the shared-pk FK "
                    "convention needs distinct pk names per collection"
                )
            pk_owner[pk] = name
            pk_counts[pk] = max(1, int(cstats.nb_documents * scale))
            pk_types[pk] = (
                cspec.get("fields", {}).get(pk, {}).get("type", "integer")
            )
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
            if fname != pk and fname in pk_counts:
                ndv = pk_counts[fname]  # FK: track the parent's scaled count
            elif ndv_raw:
                ndv = max(1, min(int(ndv_raw), n))  # selectivity-preserving
            else:
                ndv = n
            h = F.xxhash64(F.lit(fname), F.col("id"))
            is_fk = fname != pk and fname in pk_counts
            if fname == pk:
                # the pk applies the SAME seed mapping as every FK that
                # references it (identical seeds, identical domain [0, n)):
                # a workload equality literal on the pk itself then matches
                # exactly one row, and the FK side's seeded values keep a
                # parent — in range (permutation swap on both sides) AND
                # out of range (both sides emit the same literal v for
                # bucket b, so the orphan the old pk-unseeded path created
                # cannot exist).  Uniqueness holds either way: a swap is a
                # permutation, and an out-of-range v (>= n) collides with
                # no dense id.
                col = F.col("id")
                for b, v in compose_seed_mapping(
                    _literal_seeds(literals.get(fname, ())), n
                ).items():
                    col = F.when(F.col("id") == b, F.lit(v)).otherwise(col)
                if ftype not in ("integer", "number"):
                    col = col.cast("string")
            elif is_fk or ftype == "integer":
                col = F.pmod(h, F.lit(ndv))
                # seed workload numeric equality literals.  When the
                # literal v is inside [0, ndv) the seed is a SWAP of the
                # bucket values (bucket i -> v, bucket v -> i): uniformity
                # and — for FKs — referential integrity are preserved
                # exactly.  Out-of-range literals fall back to a plain
                # overwrite of bucket i so the predicate still matches
                # ~1/ndv of rows (the matching pk-side seeding above keeps
                # even that slice's parent resolvable).
                bucket = F.pmod(h, F.lit(ndv))
                for b, v in compose_seed_mapping(
                    _literal_seeds(literals.get(fname, ())), ndv
                ).items():
                    col = F.when(bucket == b, F.lit(v)).otherwise(col)
                if is_fk and pk_types.get(fname) not in ("integer", "number"):
                    col = col.cast("string")
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
                for i, lit in enumerate(literals.get(fname, ())[: ndv]):
                    val = F.when(bucket == i, F.lit(lit)).otherwise(val)
                col = val
            cols.append(col.alias(fname))
        out[name] = base.select(*cols)
    return out

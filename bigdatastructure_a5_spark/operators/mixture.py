"""Deterministic corpus mixture sampling: domain weights -> kept copies.

Training-data pipelines rarely feed the raw corpus: they MIX it — "30% of
web text, all of the books, code upsampled 2x" (GPT-3 Table 2.2 trains on
weighted draws; The Pile and DoReMi tune the domain weights themselves).
At 100 TB the mixer must be a single map-side pass, and it must be
DETERMINISTIC: a retried task has to emit exactly the rows its failed
attempt did, a re-run has to reproduce the corpus bit-for-bit, and two
engines (here: Spark and the DuckDB oracle) must agree on every kept row.
``rand()``-based sampling gives none of that, and Bernoulli draws cannot
express weights > 1 at all.

The recipe here is the standard hash-gate generalized to fractional
UPSAMPLING, one closed-form expression per row:

- ``u(key) = md5_hash60(salt || ':' || key) / 2^60`` — a deterministic
  uniform in [0, 1) per (salt, key), cross-engine identical because the
  md5-prefix arithmetic is (functions/hashing.py:78);
- a row with weight ``w`` keeps ``floor(w) + [u < frac(w)]`` copies: a
  weight of 0.25 keep-samples a quarter of the domain, 1.0 passes it
  through, 2.5 emits two copies always and a third for a deterministic
  quarter of keys.  ``E[copies] = w`` exactly, with zero coordination —
  no count, no shuffle, no state;
- kept copies explode as ``copy_id`` in [0, n) so downstream shuffles
  (dedup keys, pack order) can distinguish repeats.

Scale shape: the whole mixer is a projection plus one ``explode`` — zero
exchanges, embarrassingly parallel, output-sized cost.  The weight table
is a plan-time literal (a mixture spec is a handful of domains); weights
never join.

Like the dedup/decontam family this is extension scope (the reference
ships no data pipeline); the charter is BASELINE.json's training-data
pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.functions.hashing import md5_hash60

#: md5_hash60 ranges over [0, 2^60) — the denominator that turns it into
#: a uniform in [0, 1).  Double holds 2^60 exactly (< 2^63), and the
#: division is one IEEE op, so Spark and DuckDB agree bit-for-bit.
HASH_SPACE = float(1 << 60)


def mix_uniform(key: Column | str, salt: str = "mix") -> Column:
    """Deterministic uniform in [0, 1) per (salt, key).

    The salt keeps this draw independent of every other hash-derived
    decision on the same key (dedup buckets, simhash bits): changing the
    salt redraws the whole corpus.
    """
    k = F.col(key) if isinstance(key, str) else key
    return md5_hash60(
        F.concat(F.lit(salt), F.lit(":"), k.cast("string"))
    ) / F.lit(HASH_SPACE)


def n_copies(weight: Column, key: Column | str, salt: str = "mix") -> Column:
    """``floor(w) + [u(key) < frac(w)]`` — kept-copy count for weight w.

    Exact in expectation (E = w), deterministic per key, and monotone in
    w for a fixed key (raising a domain's weight never drops a row that
    a lower weight kept — mixture sweeps are nested samples).
    """
    base = F.floor(weight).cast("bigint")
    frac = weight - F.floor(weight)
    return base + F.when(mix_uniform(key, salt) < frac, 1).otherwise(0).cast(
        "bigint"
    )


def weighted_mixture(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """All input columns plus ``copy_id`` in [0, n_copies); rows whose
    weight keeps zero copies disappear.

    The plan is a projection + ``explode`` — no shuffle anywhere; at any
    corpus size the cost is the OUTPUT size.  ``copy_id`` makes repeats
    first-class rows (a downstream exact-dedup would otherwise fold the
    upsampled copies straight back out).

    ``weight`` is a Column, so it cannot be validated at plan time: a
    NEGATIVE or NULL weight keeps zero copies (``n <= 0`` rows are
    filtered; NULL propagates through floor and the gate and then fails
    the ``> 0`` filter) — rows quietly drop rather than erroring
    mid-job.  ``mix_domains`` validates its literal spec up front.
    """
    n = n_copies(weight, id_col, salt)
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_id", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def assign_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` label ("train"/"val"/...) by cut points on the
    deterministic uniform: ``{"train": 0.98, "val": 0.01, "test": 0.01}``
    carves [0, 1) into half-open intervals in the dict's key order.

    The properties a training split needs, all by construction:
    exhaustive + disjoint (every row gets exactly one label), stable
    under corpus growth (a document's label depends only on its key —
    adding data never reshuffles existing assignments, so yesterday's
    test set is still held out tomorrow), and engine-reproducible (the
    same md5-prefix uniform the mixer and the DuckDB oracle share).
    Fractions must sum to 1 (within 1e-9); the LAST interval absorbs the
    float dust so the union is exactly [0, 1).

    A NULL id hashes to a NULL uniform; such rows go to the FIRST split
    (by dict order — conventionally "train"), explicitly.  Without the
    explicit route, every ``u < hi`` gate is NULL and the whole chain
    falls through to the LAST interval — which is conventionally the
    TEST set: malformed ids silently contaminating the held-out split is
    the worst possible default.  Landing them in train is safe (worst
    case: a few unkeyable documents get trained on), but the real fix is
    upstream — filter or repair NULL ids before splitting.
    """
    if not fractions:
        raise ValueError("at least one split required")
    for name, f in fractions.items():
        # strictly positive: a zero split is a always-empty label (the
        # sum check would pass with {"train": 1.0, "test": 0.0}) and a
        # negative one silently shifts every later cut point
        if not 0.0 < f <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in (0, 1], got {f}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    u = mix_uniform(id_col, salt)
    names = list(fractions)
    cuts = []
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        cuts.append((name, acc))
    # build the first-match-wins chain innermost-first: the last interval
    # is the bare otherwise (it takes [cut_{n-1}, 1), absorbing the dust),
    # and each earlier interval wraps the chain so far
    expr = F.lit(names[-1])
    for name, hi in reversed(cuts):
        expr = F.when(u < hi, name).otherwise(expr)
    # NULL u would fail every gate and fall through to the LAST (test)
    # interval — route it to the first (train) split instead
    return df.withColumn(
        "split", F.when(u.isNull(), names[0]).otherwise(expr)
    )


def mix_domains(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 0.0,
) -> DataFrame:
    """Apply a per-domain weight spec: ``{"web": 0.3, "code": 2.5}``.

    Domains absent from the spec get ``default_weight`` (0.0 = drop —
    the conservative default for a curated mixture: an unreviewed source
    must be opted IN).  The spec compiles to a literal CASE chain, so the
    mixer stays a pure map-side expression with no weight-table join.
    Weights are validated up front: a negative weight in a mixture spec
    is always a bug (there is no "anti-sampling"), better a ValueError
    at plan time than silently dropped domains mid-job.
    """
    import math

    for dom, w in {**weights, "<default>": default_weight}.items():
        if not math.isfinite(w) or w < 0:
            raise ValueError(f"weight for {dom!r} must be finite >= 0, got {w}")
    expr = F.lit(float(default_weight))
    for dom, w in sorted(weights.items()):
        expr = F.when(F.col(domain_col) == dom, float(w)).otherwise(expr)
    return weighted_mixture(df, expr, id_col=id_col, salt=salt)

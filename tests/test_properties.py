"""Property-based tests (hypothesis) for the text/dedup expression helpers.

Each property runs a small batch of generated documents through ONE Spark
job per example set (examples are kept small — Spark round-trips dominate).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.functions.hashing import (
    md5_fingerprint,
    normalized_text,
    word_shingles,
)
from bigdatastructure_a5_spark.operators.text import quality_score

WORDS = st.sampled_from(
    "the quick brown fox lazy dog spark shuffle parquet scan la der und".split()
)
DOC = st.lists(WORDS, min_size=1, max_size=30).map(" ".join)
#: documents with chaotic whitespace around/between the same tokens
SPACING = st.lists(st.sampled_from([" ", "  ", "\t", "\n"]), min_size=1, max_size=8)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(doc=DOC, spacing=SPACING)
@_SETTINGS
def test_normalization_is_whitespace_invariant_and_idempotent(spark, doc, spacing):
    words = doc.split(" ")
    messy = spacing[0].join([""] + words) + spacing[-1]
    df = spark.createDataFrame([(doc,), (messy,)], ["text"])
    rows = df.select(
        normalized_text("text").alias("n"), md5_fingerprint("text").alias("fp")
    ).collect()
    assert rows[0].n == rows[1].n  # whitespace chaos normalizes away
    assert rows[0].fp == rows[1].fp
    again = (
        spark.createDataFrame([(rows[0].n,)], ["text"])
        .select(normalized_text("text").alias("n"))
        .first()
        .n
    )
    assert again == rows[0].n  # idempotent


@given(doc=DOC, n=st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_shingle_count_formula(spark, doc, n):
    df = spark.createDataFrame([(doc,)], ["text"])
    got = df.select(F.size(word_shingles("text", n)).alias("k")).first().k
    n_words = len(doc.split(" "))
    assert got == max(n_words - n + 1, 0)


@given(doc=st.text(min_size=0, max_size=200))
@_SETTINGS
def test_quality_score_bounded(spark, doc):
    df = spark.createDataFrame([(doc,)], ["text"])
    q = df.select(quality_score("text").alias("q")).first().q
    assert q is None or 0.0 <= q <= 1.0


@given(
    seeds=st.lists(st.integers(min_value=-5, max_value=40), max_size=12),
    ndv=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_compose_seed_mapping_properties(seeds, ndv):
    """Pure-logic invariants of the generator's literal seeding (no Spark):
    (1) the mapping touches only valid buckets; (2) restricted to in-range
    values it stays a PERMUTATION of [0, ndv) — uniformity/referential
    integrity; (3) every distinct in-range literal is emitted by exactly
    one bucket; (4) every out-of-range literal that got a bucket is
    emitted too (first ndv distinct literals only)."""
    from bigdatastructure_a5_spark.sources.generator import (
        compose_seed_mapping,
    )

    mapping = compose_seed_mapping(seeds, ndv)
    assert all(0 <= b < ndv for b in mapping)

    # full bucket->value function (identity off the mapping)
    emitted = [mapping.get(b, b) for b in range(ndv)]

    deduped = []
    for v in seeds:
        if v not in deduped:
            deduped.append(v)
    placed = deduped[:ndv]
    in_range = [v for v in placed if 0 <= v < ndv]
    out_range = [v for v in placed if not (0 <= v < ndv)]

    for v in in_range:
        assert emitted.count(v) == 1, (seeds, ndv, emitted)
    for v in out_range:
        assert v in emitted, (seeds, ndv, emitted)
    # permutation when no out-of-range overwrite stole a bucket
    if not out_range:
        assert sorted(emitted) == list(range(ndv)), (seeds, ndv, emitted)


@given(
    data=st.data(),
    dim=st.integers(min_value=1, max_value=6),
    j_total=st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_matrix_dots_sql_matches_sequential_python_fold(spark, data, dim, j_total):
    """functions.vectors.matrix_dots_sql — the shared one-pass fold behind
    BOTH ANN write-time projections (LSH buckets, IVF cells) — must be
    bit-identical to a per-column sequential left fold: for each column j,
    acc_j accumulates x_d * w[j][d] in element order.  That exactness is
    what makes the ANN oracles hash-checkable, so it is pinned as a
    property over random vectors/matrices (including negatives, zeros,
    and magnitudes that exercise IEEE non-associativity)."""
    from bigdatastructure_a5_spark.functions.vectors import matrix_dots_sql

    fl = st.floats(
        min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
    )
    vec = data.draw(st.lists(fl, min_size=dim, max_size=dim))
    cols = data.draw(
        st.lists(
            st.lists(fl, min_size=dim, max_size=dim),
            min_size=j_total,
            max_size=j_total,
        )
    )
    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.selectExpr(f"{matrix_dots_sql('v', cols)} AS dots").first().dots
    for j in range(j_total):
        acc = 0.0
        for d in range(dim):
            acc += float(vec[d]) * float(cols[j][d])
        assert got[j] == acc, (j, got[j], acc, vec, cols[j])

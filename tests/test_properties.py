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


@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=20),  # time
        ),
        min_size=1,
        max_size=12,
    ),
    right=st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=20),
        ),
        st.integers(min_value=100, max_value=999),  # payload rid
        min_size=0,
        max_size=12,
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_python_reference(spark, left, right):
    """operators.joins.asof_join (the union+window formulation) against an
    INDEPENDENT pure-Python argmax over random key/time data — including
    equal-timestamp ties (>= semantics: the exact-time right row attaches),
    keys with no right rows, and left rows earlier than every right row.
    The existing cross-check is Spark-vs-Spark; this one cannot share a
    bug with the engine.  Right side is generated as a dict keyed by
    (key, time), which IS the operator's dedup precondition."""
    from datetime import datetime, timedelta

    from bigdatastructure_a5_spark.operators.joins import asof_join

    base = datetime(2024, 1, 1)
    t = lambda m: base + timedelta(minutes=m)
    left_rows = [(i, k, t(m)) for i, (k, m) in enumerate(left)]
    right_rows = [(rid, k, t(m)) for (k, m), rid in sorted(right.items())]

    ldf = spark.createDataFrame(left_rows, ["lid", "k", "t"])
    rdf = spark.createDataFrame(
        right_rows or [(0, 0, t(0))], ["rid", "k", "t"]
    )
    if not right_rows:
        rdf = rdf.filter("rid < 0")  # honest empty right side

    def expect(how):
        out = {}
        for lid, k, lt in left_rows:
            cands = [
                (rt, rid) for rid, rk, rt in right_rows
                if rk == k and rt <= lt
            ]
            if cands:
                out[lid] = max(cands)[1]
            elif how == "left":
                out[lid] = None
        return out

    for how in ("inner", "left"):
        got = {
            r.lid: r.r_rid
            for r in asof_join(
                ldf, rdf, "k", "t", "t", ["rid"], how=how
            ).collect()
        }
        assert got == expect(how), (how, left_rows, right_rows)


@given(
    docs=st.lists(DOC.filter(lambda d: len(d.split()) >= 3),
                  min_size=2, max_size=5),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_lsh_never_misses_exact_duplicates(spark, docs):
    """The banded-LSH guarantee that makes MinHash dedup safe to trust at
    100 TB: an EXACT duplicate pair (identical shingle sets -> identical
    signatures -> every band collides) is a candidate with probability 1 —
    recall loss applies only to partial overlaps.  Property: for random
    docs with a planted copy of doc 0, the (0, copy) pair always surfaces
    with jaccard exactly 1.0, regardless of banding."""
    from bigdatastructure_a5_spark.operators.dedup import (
        near_duplicates_minhash,
    )

    rows = [(i, d) for i, d in enumerate(docs)]
    dup_id = len(docs)
    rows.append((dup_id, docs[0]))  # planted exact duplicate of doc 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_duplicates_minhash(
            df, threshold=0.8, num_hashes=16, bands=4
        ).collect()
    }
    assert pairs.get((0, dup_id)) == 1.0, (docs, pairs)

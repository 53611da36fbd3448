"""Unit tests for expression helpers (functions/)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.functions.hashing import (
    md5_fingerprint,
    normalized_text,
    word_shingles,
)
from bigdatastructure_a5_spark.functions.numeric import dec_sum_double, det_avg
from bigdatastructure_a5_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def test_word_shingles(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("",)], ["text"]
    ).select(word_shingles("text", 3).alias("sh"))
    rows = [r.sh for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []  # shorter than n
    assert rows[2] == []


def test_normalized_text_and_fingerprint(spark):
    df = spark.createDataFrame([("  Hello   WORLD ",), ("hello world",)], ["text"])
    out = df.select(
        normalized_text("text").alias("n"), md5_fingerprint("text").alias("fp")
    ).collect()
    assert out[0].n == "hello world"
    assert out[0].fp == out[1].fp  # normalization-equal docs collide


def test_dec_sum_and_det_avg_exact(spark):
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], ["x"])
    row = df.agg(
        dec_sum_double("x").alias("s"), det_avg("x").alias("a")
    ).collect()[0]
    assert row.s == 0.6  # exact, unlike double sum 0.6000000000000001
    assert row.a == 0.6 / 3


def test_vector_ops(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], ["a", "b"])
    row = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    assert row.dot == 18.0
    assert row.na == 3.0
    assert math.isclose(row.cos, 1.0, rel_tol=1e-12)


def test_word_shingles_from_tokens_matches_word_shingles(spark):
    """The hot-path (materialized-tokens) shingler is semantically identical
    to the single-expression form, including the short-document guard."""
    from bigdatastructure_a5_spark.functions.hashing import (
        tokens,
        word_shingles_from_tokens,
    )

    texts = [("a b c d e",), ("one two three",), ("x y",), ("",), ("  Sp  ACE   s ",)]
    df = spark.createDataFrame(texts, ["text"])
    ref = [r.sh for r in df.select(word_shingles("text", 3).alias("sh")).collect()]
    got = [
        r.sh
        for r in df.select(tokens("text").alias("toks"))
        .select(word_shingles_from_tokens("toks", 3).alias("sh"))
        .collect()
    ]
    assert got == ref


def test_shingle_sets_hashes_and_drops_short_docs(spark):
    """shingle_sets emits DISTINCT xxhash64 values and no empty sets (short
    docs are dropped by the linear pre-filter, never by a size(computed)
    predicate — see the docstring for the pushdown trap)."""
    from bigdatastructure_a5_spark.operators.dedup import shingle_sets

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    rows = {r.id: r.shingles for r in shingle_sets(df).collect()}
    assert set(rows) == {1}  # docs 2 and 3 are shorter than n=3
    expected = {
        r.h
        for r in spark.createDataFrame([("a b c",), ("b c a",), ("c a b",)], ["s"])
        .select(F.xxhash64("s").alias("h"))
        .collect()
    }
    assert set(rows[1]) == expected  # distinct hashes of the distinct trigrams


def test_ensure_min_partitions(spark):
    from bigdatastructure_a5_spark.session import ensure_min_partitions

    from bigdatastructure_a5_spark.session import _WIDEN_FLOOR

    # tiny input: widened to a size-proportional count, not blanket full
    # parallelism — 100 longs deserve the floor, not 32 tasks.
    narrow = spark.range(100).coalesce(1)
    widened = ensure_min_partitions(narrow)
    got = widened.rdd.getNumPartitions()
    assert _WIDEN_FLOOR <= got <= spark.sparkContext.defaultParallelism
    already_wide = spark.range(100).repartition(64)
    assert ensure_min_partitions(already_wide) is already_wide  # no-op
    # explicit n overrides the size heuristic
    assert ensure_min_partitions(narrow, 7).rdd.getNumPartitions() == 7


def test_lang_scores_two_stage_matches_inline(spark):
    """with_lang_scores + lang_id_from_scores == the single-expression
    lang_id on multilingual fixtures."""
    from bigdatastructure_a5_spark.operators.text import (
        lang_id,
        lang_id_from_scores,
        with_lang_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "el perro y la gata en un parque"),
            (3, "der hund und die katze ist nicht da"),
            (4, "le chien et la vache dans les champs est pour tous"),
            (5, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    inline = {r.doc_id: r.l for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    staged = {
        r.doc_id: r.l
        for r in with_lang_scores(df, "text")
        .select("doc_id", lang_id_from_scores().alias("l"))
        .collect()
    }
    assert staged == inline
    assert staged[1] == "en" and staged[2] == "es" and staged[3] == "de"
    assert staged[4] == "fr" and staged[5] == "und"


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """Approximate aggregates (absent from the reference, §2.4 'not
    present'): approx_count_distinct within its default 5% rsd on a real
    column, approx quantiles within the requested relative error."""
    from bigdatastructure_a5_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(F.approx_count_distinct("o_custkey")).first()[0]
    assert abs(approx - exact) / exact < 0.05 * 3  # 3 sigma of default rsd

    med = orders.approxQuantile("o_totalprice", [0.5], 0.01)[0]
    n = orders.count()
    below = orders.filter(F.col("o_totalprice") <= med).count()
    assert abs(below / n - 0.5) <= 0.02  # rank error bounded by rel. error


def test_countmin_sketch_guarantees(spark, sf_dir):
    """CMS one-sided error: est >= exact for EVERY key; with width >> NDV
    collisions are rare, so the mean overestimate stays small."""
    from pyspark.sql import functions as F2

    from bigdatastructure_a5_spark.catalog import load_table
    from bigdatastructure_a5_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    orders = load_table(spark, sf_dir, "orders")
    sketch = countmin_build(orders, "o_custkey", depth=4, width=1024)
    assert sketch.count() <= 4 * 1024  # bounded state, any input size
    keys = orders.select("o_custkey").distinct()
    est = countmin_estimate(sketch, keys, "o_custkey", depth=4, width=1024)
    exact = orders.groupBy("o_custkey").agg(F2.count(F2.lit(1)).alias("exact_cnt"))
    joined = est.join(exact, "o_custkey")
    assert joined.filter(F2.col("est") < F2.col("exact_cnt")).count() == 0
    row = joined.select(
        F2.avg(F2.col("est") - F2.col("exact_cnt")).alias("mean_over"),
        F2.avg("exact_cnt").alias("mean_exact"),
    ).first()
    assert row.mean_over <= max(1.0, 0.5 * row.mean_exact)

    # the internal-name guard covers passthrough columns AND the key
    # itself: a key named 'cell' would duplicate the probe struct's columns
    import pytest

    with pytest.raises(ValueError, match="collide"):
        countmin_estimate(
            sketch, keys.withColumnRenamed("o_custkey", "cell"), "cell"
        )
    with pytest.raises(ValueError, match="collide"):
        countmin_estimate(
            sketch, keys.withColumn("est", F2.lit(1)), "o_custkey"
        )


def test_countmin_null_keys_outside_domain(spark):
    """NULL keys hash to NULL cells no equi-join can reach, so keeping
    them would break the one-sided guarantee (a NULL probe would read 0
    under a positive true count).  Both sides exclude NULL: the sketch
    stores no NULL-cell rows, NULL probes emit no estimate rows, and
    non-NULL keys keep est >= truth."""
    from pyspark.sql import functions as F2

    from bigdatastructure_a5_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    df = spark.createDataFrame(
        [(1,), (1,), (None,), (None,), (2,)], "k int"
    )
    sketch = countmin_build(df, "k", depth=2, width=64)
    assert sketch.filter(F2.col("cell").isNull()).count() == 0
    est = {
        r.k: r.est
        for r in countmin_estimate(
            sketch, df.select("k").distinct(), "k", depth=2, width=64
        ).collect()
    }
    assert None not in est
    assert est[1] >= 2 and est[2] >= 1


def test_registry_rejects_duplicate_names():
    import pytest

    from bigdatastructure_a5_spark.registry import REGISTRY, _load_all, query

    _load_all()
    existing = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate"):

        @query(existing)
        def clash(spark, sf_dir):  # pragma: no cover - must not register
            raise AssertionError

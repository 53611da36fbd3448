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

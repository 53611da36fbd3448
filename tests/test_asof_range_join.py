"""Semantics tests for the as-of and banded range joins (beyond reference
scope, SURVEY.md §2.3 'not present' list)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.joins import asof_join, range_join


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def _left(spark):
    return spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 2, _ts(5)), (4, 3, _ts(9))],
        ["lid", "k", "t"],
    )


def _right(spark):
    return spark.createDataFrame(
        [(100, 1, _ts(8)), (101, 1, _ts(10)), (102, 1, _ts(15)), (103, 2, _ts(6))],
        ["rid", "k", "t"],
    )


def test_asof_backward_inner(spark):
    out = asof_join(
        _left(spark), _right(spark), on="k", left_time="t", right_time="t",
        right_payload=["rid"], how="inner",
    )
    got = {r.lid: r.r_rid for r in out.collect()}
    # lid=1 at t=10 matches rid=101 (exact-time match attaches, >= semantics)
    # lid=2 at t=20 matches rid=102 (latest <= 20)
    # lid=3 at t=5 has no prior view for k=2 (6 > 5) -> dropped by inner
    # lid=4: key 3 has no right rows at all -> dropped
    assert got == {1: 101, 2: 102}


def test_asof_backward_left_keeps_unmatched(spark):
    out = asof_join(
        _left(spark), _right(spark), on="k", left_time="t", right_time="t",
        right_payload=["rid"], how="left",
    )
    got = {r.lid: r.r_rid for r in out.collect()}
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_asof_forward(spark):
    out = asof_join(
        _left(spark), _right(spark), on="k", left_time="t", right_time="t",
        right_payload=["rid"], direction="forward", how="inner",
    )
    got = {r.lid: r.r_rid for r in out.collect()}
    # forward: earliest right >= left. lid=1 t=10 -> rid=101 (equal), lid=2
    # t=20 -> none, lid=3 t=5 -> rid=103 at t=6.
    assert got == {1: 101, 3: 103}


def test_asof_matches_sql_inequality_argmax(spark):
    """Cross-check the window implementation against the naive (explosive)
    formulation on a bigger random-ish frame."""
    left = spark.range(200).select(
        F.col("id").alias("lid"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 37) % 1000).alias("t"),
    )
    right = spark.range(150).select(
        F.col("id").alias("rid"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") * 53) % 1000).alias("t"),
    )
    # dedupe right per (k, t) as the operator contract requires
    right = right.groupBy("k", "t").agg(F.max("rid").alias("rid"))
    out = asof_join(left, right, "k", "t", "t", ["rid"], how="inner")
    got = {(r.lid, r.r_rid) for r in out.collect()}
    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k")) & (F.col("l.t") >= F.col("r.t")))
        .groupBy("l.lid")
        .agg(F.max_by(F.struct("r.t", "r.rid"), F.struct("r.t", "r.rid")).alias("m"))
        .select("lid", F.col("m.rid").alias("rid"))
    )
    assert got == {(r.lid, r.rid) for r in naive.collect()}


def test_asof_null_times_and_keys_never_match(spark):
    """SQL/DuckDB ASOF semantics: NULL never matches.  A NULL right_time
    row must not be carried as a match (asc sorts nulls FIRST, where the
    window carry would otherwise hand it to every early left row); NULL
    keys must not pair with each other; a NULL left_time takes no match
    even in forward mode (desc sorts nulls LAST, after every real row)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(1)), (2, None, _ts(5)), (3, 1, None)],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [(9, 1, None), (8, None, _ts(1)), (7, 1, _ts(30))],
        ["rid", "k", "t"],
    )
    backward = asof_join(
        left, right, "k", "t", "t", ["rid"], how="left"
    )
    got = {r.lid: r.r_rid for r in backward.collect()}
    # lid=1 at t=1: the only real right row is t=30 (future) -> no match;
    # the NULL-time rid=9 must NOT leak in.  NULL key / NULL time: no match.
    assert got == {1: None, 2: None, 3: None}

    forward = asof_join(
        left, right, "k", "t", "t", ["rid"], direction="forward", how="left"
    )
    got_f = {r.lid: r.r_rid for r in forward.collect()}
    # lid=1 t=1 -> earliest future is rid=7 at t=30; NULL rows still match
    # nothing (lid=3 is the desc-nulls-last carry case)
    assert got_f == {1: 7, 2: None, 3: None}


def test_range_join_bounds_and_bucket_crossing(spark):
    left = spark.createDataFrame([(1, 1, _ts(10))], ["lid", "k", "t"])
    right = spark.createDataFrame(
        [
            (200, 1, _ts(4, 59)),   # 301s before: outside [-300, 0]
            (201, 1, _ts(5)),       # exactly -300s: inclusive lower bound
            (202, 1, _ts(8, 30)),   # inside, different bucket than t=10
            (203, 1, _ts(10)),      # exactly 0s: inclusive upper bound
            (204, 1, _ts(10, 1)),   # +1s: future, excluded
            (205, 2, _ts(9)),       # wrong key
        ],
        ["rid", "k", "t"],
    )
    out = range_join(left, right, on="k", left_time="t", right_time="t",
                     low_seconds=-300, high_seconds=0)
    assert {r.r_rid for r in out.collect()} == {201, 202, 203}


def test_asof_null_payload_column_does_not_mix_rows(spark):
    """A matched right row carrying a NULL in one payload column must NOT
    have that column backfilled from an older right row — the whole payload
    comes from the single as-of row (struct carry, not per-column carry)."""
    left = spark.createDataFrame([(1, 1, _ts(20))], ["lid", "k", "t"])
    right = spark.createDataFrame(
        [(100, "old", 1, _ts(5)), (101, None, 1, _ts(10))],
        ["rid", "note", "k", "t"],
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["rid", "note"], how="inner",
    ).collect()
    assert len(out) == 1
    assert out[0].r_rid == 101
    assert out[0].r_note is None  # NOT "old"

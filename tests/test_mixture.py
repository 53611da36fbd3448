"""Mixture operator (operators/mixture.py) + its gate query: hash-gate
determinism, weight semantics across every regime, the nested-sample
property, zero-shuffle plan shape, and the engine-vs-oracle match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.mixture import (
    assign_split,
    mix_domains,
    mix_uniform,
    n_copies,
    weighted_mixture,
)

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark, n=400, n_domains=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % n_domains).cast("string")).alias(
            "source"
        ),
    )


def test_mixture_is_deterministic(spark):
    """Two runs emit the identical row multiset — the retried-task /
    re-run guarantee rand()-sampling cannot give."""
    df = _docs(spark)
    a = sorted(
        (r.doc_id, r.copy_id)
        for r in weighted_mixture(df, F.lit(0.7)).collect()
    )
    b = sorted(
        (r.doc_id, r.copy_id)
        for r in weighted_mixture(df, F.lit(0.7)).collect()
    )
    assert a == b and len(a) > 0


def test_weight_regimes(spark):
    """Integer weights copy exactly; fractional weights keep a hash-gated
    subset; weight 0 drops everything; E[copies] = w within binomial
    noise."""
    df = _docs(spark, n=1000)
    n = df.count()
    assert weighted_mixture(df, F.lit(0.0)).count() == 0
    assert weighted_mixture(df, F.lit(1.0)).count() == n
    assert weighted_mixture(df, F.lit(3.0)).count() == 3 * n
    kept = weighted_mixture(df, F.lit(0.5)).count()
    assert 0.4 * n < kept < 0.6 * n
    up = weighted_mixture(df, F.lit(2.25)).count()
    assert 2.15 * n < up < 2.35 * n


def test_copy_ids_are_dense(spark):
    """copy_id enumerates 0..n-1 per kept doc — repeats are first-class,
    distinguishable rows."""
    df = _docs(spark, n=50)
    rows = weighted_mixture(df, F.lit(2.5)).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy_id)
    for doc_id, copies in by_doc.items():
        assert sorted(copies) == list(range(len(copies))), doc_id
        assert len(copies) in (2, 3)


def test_weights_are_nested_samples(spark):
    """Raising a weight never drops a previously-kept row (monotone gate:
    u < frac is nested across frac) — mixture sweeps compare supersets,
    not re-draws."""
    df = _docs(spark)
    lo = {(r.doc_id, r.copy_id) for r in weighted_mixture(df, F.lit(0.3)).collect()}
    hi = {(r.doc_id, r.copy_id) for r in weighted_mixture(df, F.lit(0.8)).collect()}
    assert lo <= hi


def test_salt_redraws(spark):
    """Different salts draw different subsets of the same expected size —
    the independence knob vs other hash-derived decisions."""
    df = _docs(spark, n=1000)
    a = {r.doc_id for r in weighted_mixture(df, F.lit(0.5), salt="a").collect()}
    b = {r.doc_id for r in weighted_mixture(df, F.lit(0.5), salt="b").collect()}
    assert a != b
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # independent draws overlap ~rate


def test_mix_domains_spec(spark):
    """Per-domain weights apply by label; unlisted domains get the
    default (0.0 = opted out)."""
    df = _docs(spark, n=400, n_domains=4)  # 100 docs per domain
    out = mix_domains(
        df, {"d0": 2.0, "d1": 0.0, "d2": 1.0}, domain_col="source"
    )
    by_dom = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_dom.get("d0") == 200
    assert "d1" not in by_dom
    assert by_dom.get("d2") == 100
    assert "d3" not in by_dom  # default drops


def test_mixture_plan_has_no_exchange(spark):
    """The 100 TB claim, pinned on the plan: projection + explode only —
    no shuffle, no Python stage."""
    df = _docs(spark)
    plan = (
        weighted_mixture(df, F.lit(1.5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_uniform_is_in_unit_interval(spark):
    df = _docs(spark, n=200)
    row = df.select(
        F.min(mix_uniform("doc_id")).alias("lo"),
        F.max(mix_uniform("doc_id")).alias("hi"),
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0


def test_assign_split_is_exhaustive_disjoint_stable(spark):
    """Every row gets exactly one label; proportions land near the
    fractions; and labels are STABLE under corpus growth — the holdout
    guarantee (adding data never reassigns an existing document)."""
    df = _docs(spark, n=2000)
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = assign_split(df, fr)
    counts = {
        r.split: r.cnt
        for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert sum(counts.values()) == 2000  # exhaustive + disjoint
    assert 1700 < counts["train"] < 1900
    assert 50 < counts["val"] < 150 and 50 < counts["test"] < 150
    small = {
        r.doc_id: r.split for r in assign_split(_docs(spark, n=500), fr).collect()
    }
    big = {r.doc_id: r.split for r in out.collect()}
    assert all(big[k] == v for k, v in small.items())  # growth-stable


def test_assign_split_validates_fractions(spark):
    df = _docs(spark, n=10)
    with pytest.raises(ValueError):
        assign_split(df, {"train": 0.9, "val": 0.05})
    with pytest.raises(ValueError):
        assign_split(df, {})
    with pytest.raises(ValueError):  # zero split = always-empty label
        assign_split(df, {"train": 1.0, "test": 0.0})
    with pytest.raises(ValueError):  # negative shifts later cut points
        assign_split(df, {"a": -0.5, "b": 1.5})


def test_mix_domains_validates_weights(spark):
    df = _docs(spark, n=10)
    with pytest.raises(ValueError):
        mix_domains(df, {"d0": -1.0})
    with pytest.raises(ValueError):
        mix_domains(df, {"d0": float("nan")})
    with pytest.raises(ValueError):
        mix_domains(df, {"d0": 1.0}, default_weight=-0.1)


def test_negative_and_null_column_weights_drop(spark):
    """A Column weight cannot be validated at plan time: negative and
    NULL weights keep zero copies (quiet drop, never a mid-job error) —
    the documented contract."""
    df = _docs(spark, n=20)
    w = F.when(F.col("doc_id") % 2 == 0, F.lit(-3.0)).otherwise(
        F.lit(None).cast("double")
    )
    assert weighted_mixture(df, w).count() == 0


def test_split_and_mixture_draws_are_independent(spark):
    """The split salt differs from the mixture salt, so holding out a
    test set does not bias which documents a 0.5-weight domain keeps."""
    df = _docs(spark, n=2000)
    labeled = assign_split(df, {"train": 0.5, "test": 0.5})
    kept = weighted_mixture(labeled, F.lit(0.5))
    n_train = kept.filter(F.col("split") == "train").count()
    n_test = kept.filter(F.col("split") == "test").count()
    assert abs(n_train - n_test) < 0.2 * (n_train + n_test)


def test_null_key_semantics_pinned(spark):
    """A NULL mixing key hashes to NULL, the u < frac gate is then
    false, and the row keeps exactly floor(w) copies — deterministic,
    never a crash.  Pinned so a refactor cannot silently change it."""
    df = spark.createDataFrame(
        [(None, "d0"), (7, "d0")], "doc_id bigint, source string"
    )
    kept = weighted_mixture(df, F.lit(0.9))
    assert [r.doc_id for r in kept.collect()] == [7]  # NULL: floor(0.9)=0
    up = weighted_mixture(df, F.lit(2.3))
    null_copies = [r for r in up.collect() if r.doc_id is None]
    assert len(null_copies) == 2  # floor(2.3), the fractional gate closed


def test_mixer_is_streaming_safe(spark, tmp_path):
    """The mixer is a stateless projection + explode, so the SAME
    expression runs unchanged in a Structured Streaming query — mixture
    at ingest, no batch/stream fork.  (Spark rejects stateful ops in
    append streams; this pins that the mixer never becomes one.)"""
    src = str(tmp_path / "mix_src")
    _docs(spark, n=100).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, source string").parquet(
        src
    )
    q = (
        weighted_mixture(stream, F.lit(1.5))
        .writeStream.format("memory")
        .queryName("mix_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "mix_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.doc_id, r.copy_id)
        for r in spark.sql("SELECT * FROM mix_stream_t").collect()
    )
    want = sorted(
        (r.doc_id, r.copy_id)
        for r in weighted_mixture(
            spark.read.parquet(src), F.lit(1.5)
        ).collect()
    )
    assert got == want and len(got) > 100  # stream == batch, upsampled


def test_gate_query_matches_duckdb_oracle(spark):
    """The registry entry vs its oracle at sf0.001 (the driver's own
    check runs sf0.01; this is the fast in-suite pin)."""
    import duckdb

    from bigdatastructure_a5_spark.queries.mixture_queries import (
        _MIX_ORACLE,
        pipeline_mixture,
    )

    got = sorted(
        (r.doc_id, r.source, r.n_chars, r.copy_id)
        for r in pipeline_mixture(spark, SF_SMALL).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(_MIX_ORACLE).fetchall())
    assert got == want and len(got) > 0


def test_assign_split_null_ids_go_to_first_split(spark):
    """A NULL id hashes to a NULL uniform; without an explicit route it
    would fail every u < hi gate and fall through to the LAST interval —
    silently contaminating the test set.  Pinned: NULL-id rows land in
    the FIRST split (train), never in a later one."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id bigint"
    )
    out = assign_split(
        df, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    by_id = {r.doc_id: r.split for r in out}
    assert by_id[None] == "train"
    assert set(by_id.values()) <= {"train", "val", "test"}

"""UDF surface tests: vectorized pandas UDF, applyInPandas UDAF shape, UDTF."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.functions.udfs import (
    burstiness,
    chunk_documents,
    iqr_outlier_bounds,
)


def test_pandas_udf_burstiness(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 10]], ["v"])
    out = df.coalesce(1).select(burstiness("v").alias("b")).collect()
    vals = sorted(r.b for r in out)
    assert math.isclose(sum(vals), 0.0, abs_tol=1e-9)  # z-scores sum to 0
    assert vals[-1] > 1.5  # the outlier sticks out


def test_apply_in_pandas_iqr(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    fences = iqr_outlier_bounds(ev, "event_type", "value")
    rows = {r.event_type: r for r in fences.collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r.lo < r.hi and r.n > 0


def test_apply_in_pandas_iqr_numeric_key(spark, sf_dir):
    """The output schema must carry the group column's REAL type — a
    hardcoded string type made any numeric key (the common case: bigint
    ids) die in the worker's Arrow conversion."""
    ev = load_table(spark, sf_dir, "events")
    fences = iqr_outlier_bounds(ev, "user_id", "value")
    row = fences.orderBy("user_id").first()
    assert isinstance(row.user_id, int) and row.lo < row.hi


def test_udtf_chunking(spark):
    df = spark.createDataFrame([(1, "a" * 250)], ["doc_id", "text"])
    chunks = chunk_documents(df, "text", size=100)
    rows = chunks.select("doc_id", "piece_no", F.length("piece").alias("n")).collect()
    assert [(r.piece_no, r.n) for r in sorted(rows, key=lambda r: r.piece_no)] == [
        (0, 100),
        (1, 100),
        (2, 50),
    ]

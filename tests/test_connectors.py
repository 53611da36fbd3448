"""CSV / JSON-lines connector tests: explicit-schema reads, corrupt-row
quarantine, format conversion, and the CSV column-pruning property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdatastructure_a5_spark.sources.connectors import (
    bad_rows,
    csv_to_parquet,
    good_rows,
    jsonl_to_parquet,
    read_csv,
    read_jsonl,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "data.csv"
    p.write_text("id,name,score\n1,alice,1.5\n2,bob,2.5\nnot_a_long,x,y\n")
    return str(p)


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "alice", "score": 1.5}\n'
        '{"id": 2, "name": "bob", "score": 2.5}\n'
        "this is not json\n"
    )
    return str(p)


def test_csv_good_and_quarantined_rows(spark, csv_file):
    df = read_csv(spark, csv_file, SCHEMA)
    assert {r.id for r in good_rows(df).collect()} == {1, 2}
    assert bad_rows(df).count() == 1


def test_jsonl_good_and_quarantined_rows(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, SCHEMA)
    good = {r.id: r.score for r in good_rows(df).collect()}
    assert good == {1: 1.5, 2: 2.5}
    assert bad_rows(df).count() == 1


def test_csv_strict_mode_raises(spark, csv_file):
    with pytest.raises(Exception):
        read_csv(spark, csv_file, SCHEMA, strict=True).collect()


def test_csv_to_parquet_roundtrip(spark, csv_file, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("pq") / "t")
    out = csv_to_parquet(spark, csv_file, dst, SCHEMA)
    assert out.schema == SCHEMA
    assert out.count() == 2


def test_jsonl_to_parquet_partitioned(spark, jsonl_file, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("pq") / "t")
    out = jsonl_to_parquet(spark, jsonl_file, dst, SCHEMA, partition_by=("name",))
    assert out.count() == 2
    # partition pruning works on the converted table
    plan = (
        out.filter(F.col("name") == "alice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan


def test_csv_scan_prunes_columns(spark, csv_file):
    """Spark prunes columns on STRICT CSV scans (ReadSchema shows the
    projection).  With corrupt-record capture the scan must parse every
    column to decide validity, so pruning only applies without it —
    predicate pushdown beyond pruning is parquet-only.  Both facts are the
    documented reason the to-parquet converters exist."""
    df = read_csv(spark, csv_file, SCHEMA, strict=True).select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "name" not in read_schema and "score" not in read_schema


def test_orc_roundtrip_pushdown_and_conversion(spark, tmp_path_factory):
    """ORC connector: write/read roundtrip preserves schema and rows;
    predicate pushdown + column pruning reach the ORC scan exactly as on
    parquet (PushedFilters/ReadSchema in the plan); the to-parquet
    converter lands the same rows columnar."""
    from bigdatastructure_a5_spark.sources.connectors import (
        orc_to_parquet,
        read_orc,
        write_orc,
    )

    src = spark.createDataFrame(
        [(1, "alice", 9.5), (2, "bob", 3.25), (3, "cara", 7.0)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path_factory.mktemp("orc") / "t")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}

    plan = (
        back.filter(F.col("id") == 2)
        .select("name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "score" not in read_schema

    dst = str(tmp_path_factory.mktemp("pq") / "t")
    out = orc_to_parquet(spark, path, dst)
    assert out.count() == 3 and out.schema == src.schema


def test_orc_twin_of_registry_agg_pricing_summary(
    spark, sf_dir, tmp_path_factory
):
    """ORC twin of a GATE query (VERDICT r4 item 8): the registry's
    `agg_pricing_summary` over parquet vs the identical logical query over
    an ORC copy of lineitem must return bit-identical rows — evidence that
    the connector path composes with the real query surface, without
    growing the 50-query registry (the gate fixtures are parquet; ORC
    stays a pytest-only surface, see the connectors module docstring)."""
    from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
    from bigdatastructure_a5_spark.sources.connectors import (
        read_orc,
        write_orc,
    )

    _load_all()
    parquet_df = REGISTRY["agg_pricing_summary"].builder(spark, sf_dir)
    want = sorted(map(tuple, parquet_df.collect()))

    from bigdatastructure_a5_spark.catalog import load_table
    from bigdatastructure_a5_spark.queries.parity import pricing_summary_over

    path = str(tmp_path_factory.mktemp("orc_twin") / "lineitem")
    write_orc(load_table(spark, sf_dir, "lineitem"), path)
    li = read_orc(spark, path)
    got = sorted(map(tuple, pricing_summary_over(li).collect()))
    assert got == want and len(got) > 0

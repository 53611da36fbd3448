"""Skew mitigation, sizing engine, and JSON-Schema loader tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.operators.skew import salted_agg, salted_join
from bigdatastructure_a5_spark.plans.sizing import (
    document_size_bytes,
    modeled_vs_real,
)
from bigdatastructure_a5_spark.sources.schema_loader import (
    json_schema_to_spark,
    load_collection_schemas,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part")
    plain = li.join(part, "p_partkey").count()
    salted = salted_join(li, part, "p_partkey", salt=8).count()
    assert salted == plain


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, r.s)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n_rows, r.sum_l_quantity)
        for r in salted_agg(li, ["l_returnflag"], ["l_quantity"], salt=8).collect()
    }
    assert salted == plain  # decimal partials -> exact equality


def test_document_size_matches_reference_constants():
    """Golden arithmetic from the reference's own unit test
    (tests/test_challenge.py:63-99 uses 8 B ints + overrides; here the
    homework Product shape, main.py:42-106): struct of id(int) + name(string)
    = 12+8 + 12+80."""
    schema = StructType().add("id", LongType()).add("name", StringType())
    assert document_size_bytes(schema) == (12 + 8) + (12 + 80)
    nested = (
        StructType()
        .add("id", LongType())
        .add("price", StructType().add("amount", DoubleType()).add("currency", StringType()))
        .add("tags", ArrayType(StringType()))
    )
    # id 20, price: 12 + (12+8 + 12+80), tags: 12 + 2*80 with avg len 2
    expected = 20 + 12 + (20 + 92) + 12 + 2 * 80
    assert document_size_bytes(nested, avg_array_lengths={"tags": 2.0}) == expected


def test_modeled_vs_real_sizes(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    d = modeled_vs_real(part)
    assert d["rows"] == part.count()
    assert d["modeled_bytes"] > 0 and d["real_bytes"] > 0


def test_json_schema_loader_with_ref_and_allof(tmp_path):
    (tmp_path / "product.json").write_text(
        json.dumps(
            {
                "type": "object",
                "properties": {
                    "IDP": {"type": "integer"},
                    "brand": {"type": "string"},
                    "price": {
                        "type": "object",
                        "properties": {"amount": {"type": "number"}},
                    },
                    "categories": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "properties": {"title": {"type": "string"}},
                        },
                    },
                },
            }
        )
    )
    (tmp_path / "db.json").write_text(
        json.dumps(
            {
                "Product": {
                    "allOf": [
                        {"$ref": "product.json"},
                        {
                            "type": "object",
                            "properties": {
                                "launchDate": {"type": "string", "format": "date"}
                            },
                        },
                    ]
                },
                "Stock": {
                    "type": "object",
                    "properties": {
                        "IDW": {"type": "integer"},
                        "quantity": {"type": "integer"},
                    },
                },
            }
        )
    )
    schemas = load_collection_schemas(tmp_path / "db.json")
    prod = schemas["Product"]
    assert isinstance(prod["IDP"].dataType, LongType)
    assert isinstance(prod["price"].dataType, StructType)
    assert isinstance(prod["categories"].dataType, ArrayType)
    assert isinstance(prod["launchDate"].dataType, DateType)  # allOf merged
    assert isinstance(schemas["Stock"]["quantity"].dataType, LongType)


def test_pk_equality_literal_seeded_with_integrity(spark):
    """A workload equality literal on a PRIMARY KEY must exist in the
    generated data (the generator's stated guarantee), stay unique, and
    keep every referencing FK resolvable — the pk applies the same seed
    mapping as its FKs, so even an out-of-scaled-range literal (125 in a
    100-row scaled parent) has both the matching parent row and matching
    child rows."""
    from bigdatastructure_a5_spark.sources.generator import generate_tables
    from bigdatastructure_a5_spark.sources.json_config import CollectionStats

    schema = {
        "customer": {
            "primary_key": "IDC",
            "fields": {"IDC": {"type": "integer"}},
        },
        "orderline": {
            "primary_key": "IDO",
            "fields": {"IDO": {"type": "integer"}, "IDC": {"type": "integer"}},
        },
    }
    stats = {
        "customer": CollectionStats(nb_documents=1000),
        "orderline": CollectionStats(nb_documents=5000),
    }
    corpus = generate_tables(
        spark, schema, stats, scale=0.1, literals={"IDC": ["125"]}
    )
    cust = [r.IDC for r in corpus["customer"].collect()]
    assert len(cust) == 100
    assert cust.count(125) == 1              # the pk predicate matches a row
    assert len(set(cust)) == len(cust)       # uniqueness preserved
    fks = {r.IDC for r in corpus["orderline"].collect()}
    assert 125 in fks                        # the child predicate matches too
    assert fks <= set(cust)                  # referential integrity intact


def test_nested_ref_resolves_relative_to_referencing_file(tmp_path):
    """A $ref chain crossing directories: db.json -> sub/product.json ->
    detail.json must read sub/detail.json (relative to the file containing
    the ref), not a same-named file at the root."""
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "detail.json").write_text(
        json.dumps(
            {"type": "object", "properties": {"weight": {"type": "number"}}}
        )
    )
    # a decoy at the root with a DIFFERENT shape: resolving against the
    # wrong base dir would silently load this one
    (tmp_path / "detail.json").write_text(
        json.dumps(
            {"type": "object", "properties": {"wrong": {"type": "string"}}}
        )
    )
    (sub / "product.json").write_text(json.dumps({"$ref": "detail.json"}))
    (tmp_path / "db.json").write_text(
        json.dumps({"Product": {"$ref": "sub/product.json"}})
    )
    schemas = load_collection_schemas(tmp_path / "db.json")
    assert set(schemas["Product"].fieldNames()) == {"weight"}


def test_schema_usable_for_spark_read(spark, tmp_path):
    st = json_schema_to_spark(
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        }
    )
    df = spark.createDataFrame([(1, "x")], schema=st)
    assert df.schema == st


def test_stats_and_flat_schema_loaders(tmp_path):
    from bigdatastructure_a5_spark.sources.json_config import (
        load_flat_schema,
        load_stats,
    )

    (tmp_path / "stats.json").write_text(
        json.dumps(
            {
                "cluster": {"nb_servers": 1000, "sharding_access_fraction": 0.1},
                "collections": {
                    "Product": {
                        "nb_documents": 100000,
                        "distinct_values": {"brand": 5000},
                        "field_selectivity": {"brand": 0.0005},
                        "sharding_key": "IDP",
                    }
                },
            }
        )
    )
    cluster, stats = load_stats(tmp_path / "stats.json")
    assert cluster.nb_servers == 1000
    assert cluster.shuffle_partitions() == 1000
    assert stats["Product"].distinct_values["brand"] == 5000
    assert stats["Product"].sharding_key == "IDP"

    (tmp_path / "schema.json").write_text(
        json.dumps(
            {
                "collections": {
                    "Product": {
                        "primary_key": "IDP",
                        "fields": {
                            "IDP": {"type": "integer"},
                            "brand": {"type": "string", "avg_size": 40},
                        },
                    }
                }
            }
        )
    )
    flat = load_flat_schema(tmp_path / "schema.json")
    assert flat["Product"]["primary_key"] == "IDP"
    assert flat["Product"]["fields"]["brand"]["avg_size"] == 40


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join (enabled in session.py) must actually fire on a skewed
    shuffle join: one key holding ~95% of a padded fact table makes one
    shuffle partition dwarf the median, and the executed adaptive plan must
    show the skew=true sort-merge join (r1/r2 advice item: prove the
    runtime mitigation, not just the salting operators)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # force a sort-merge join and lower the skew thresholds so the
        # fixture-sized hot partition (a few MiB) counts as skewed
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")

        fact = spark.range(120_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.pmod(F.col("id"), 97))
            .alias("k"),
            F.rpad(F.col("id").cast("string"), 96, "x").alias("pad"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # keep the pad column through the join so the shuffled hot
        # partition is actually megabytes (column pruning would otherwise
        # shrink it below the skew threshold)
        joined = fact.join(dim, "k").select("k", "pad", "v")
        # execute THIS dataframe's plan (count() would plan a separate
        # aggregate query and leave this one's adaptive plan unfinalized)
        n = len(joined.collect())
        assert n == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_json_schema_loader_on_reference_schema_files():
    """Load the reference's OWN five chapter-5 schema files
    (`/root/reference/schemas/db{1..5}.json`, which exercise `$ref` to a
    sibling file, `$ref` with a `#/Collection` fragment, and `allOf`
    composition over `product.json`) and check the derived Spark types —
    the S1/S2 parity pin against the real artifacts, not synthetic
    fixtures."""
    import pytest
    from pathlib import Path

    from pyspark.sql.types import ArrayType, IntegerType, LongType, StructType

    ref = Path("/root/reference/schemas")
    if not ref.is_dir():  # pragma: no cover - reference absent in some envs
        pytest.skip("reference schemas not available")

    for n in range(1, 6):
        schemas = load_collection_schemas(ref / f"db{n}.json")
        assert schemas, f"db{n}.json produced no collections"
        for name, st in schemas.items():
            assert isinstance(st, StructType) and len(st.fields) > 0, (n, name)

    db2 = load_collection_schemas(ref / "db2.json")
    # allOf: Product = product.json base + embedded stocks array
    prod = db2["Product"]
    names = set(prod.fieldNames())
    assert {"IDP", "name", "brand", "price", "stocks"} <= names
    stocks = prod["stocks"].dataType
    assert isinstance(stocks, ArrayType)
    assert isinstance(stocks.elementType, StructType)
    assert {"IDW", "quantity", "location"} <= set(
        stocks.elementType.fieldNames()
    )
    # price is a nested struct with numeric members
    price = prod["price"].dataType
    assert isinstance(price, StructType)
    # $ref with fragment: Warehouse resolved out of db1.json#/Warehouse
    assert "Warehouse" in db2
    idw = db2["Warehouse"]["IDW"].dataType
    assert isinstance(idw, (IntegerType, LongType))

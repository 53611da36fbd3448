"""The reference-format CLI must consume the reference's OWN JSON files
(`/root/reference/challenge/*.json`) end-to-end and reproduce its headline
result: D1 (normalized) wins the challenge leaderboard (REPORT.md:150-173).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

REF = Path("/root/reference/challenge")


@pytest.fixture(scope="module")
def cli_report(spark, tmp_path_factory):
    if not REF.exists():
        pytest.skip("reference JSON configs unavailable")
    from bigdatastructure_a5_spark.plans.workload import run_workload
    from bigdatastructure_a5_spark.sources.generator import (
        extract_equality_literals,
        generate_tables,
    )
    from bigdatastructure_a5_spark.sources.json_config import (
        load_denormalizations,
        load_flat_schema,
        load_queries,
        load_query_frequencies,
        load_stats,
    )

    schema = load_flat_schema(REF / "schema.json")
    _cluster, stats = load_stats(REF / "stats.json")
    queries = load_queries(
        REF / "queries.json", defaults=load_query_frequencies(REF / "stats.json")
    )
    denorms = load_denormalizations(REF / "denormalizations.json", schema=schema)
    literals = extract_equality_literals([q.sql for q in queries])
    base = generate_tables(spark, schema, stats, scale=0.005, literals=literals)
    out = tmp_path_factory.mktemp("cli_out")
    storage = tmp_path_factory.mktemp("cli_variants")
    report = run_workload(
        spark, base, denorms, queries, str(storage), str(out)
    )
    return report, out, denorms, queries


def test_reference_configs_parse(cli_report):
    report, _out, denorms, queries = cli_report
    assert [d.id for d in denorms] == ["D1", "D2", "D3", "D4"]
    # embeds carry inferred IDP join keys (shared pk, challenge/loader.py)
    d2 = denorms[1]
    assert d2.embeds[0].source == "Product" and d2.embeds[0].target == "OrderLine"
    assert d2.embeds[0].target_key == "IDP" == d2.embeds[0].source_key
    # frequencies from queries.json (1000/100, challenge/queries.json)
    assert {q.id: q.frequency for q in queries} == {"Q1": 1000.0, "Q2": 100.0}


def test_d1_wins_reference_leaderboard(cli_report):
    report, _out, denorms, queries = cli_report
    assert len(report.rows) == len(denorms) * len(queries)
    board = report.leaderboard()
    assert board[0][0] == "D1"  # reference REPORT.md: D1 wins on all metrics
    # and it wins because the normalized layout scans least: the embedding
    # layouts pay for Q1 (freq 1000) on wider tables
    totals = dict(board)
    assert totals["D1"]["price"] < totals["D2"]["price"]
    assert totals["D1"]["price"] < totals["D3"]["price"]


def test_cli_sinks_written(cli_report):
    _report, out, _denorms, _queries = cli_report
    assert (out / "leaderboard.md").exists()
    assert (out / "results.csv").exists()
    report_json = json.loads((out / "report.json").read_text())
    assert set(report_json["totals"]) == {"D1", "D2", "D3", "D4"}
    assert len(os.listdir(out / "plans")) == 8  # one plan JSON per (variant, query)


def test_generator_seeds_numeric_equality_literals(spark):
    """Q2-style integer predicates (ol.IDC = 125) must select ~1/NDV of
    rows by construction, not by NDV capping luck: the literal is swapped
    into the value space, preserving uniformity AND (for FKs) referential
    integrity."""
    from bigdatastructure_a5_spark.sources.generator import (
        extract_equality_literals,
        generate_tables,
    )

    schema = {
        "Customer": {
            "primary_key": "IDC",
            "fields": {"IDC": {"type": "integer", "avg_size": 8}},
        },
        "OrderLine": {
            "primary_key": "IDO",
            "fields": {
                "IDO": {"type": "integer", "avg_size": 8},
                "IDC": {"type": "integer", "avg_size": 8},
            },
        },
    }
    from bigdatastructure_a5_spark.sources.json_config import CollectionStats

    stats = {
        "Customer": CollectionStats(200, {"IDC": 200}, {}, {}, None),
        "OrderLine": CollectionStats(2000, {"IDC": 200}, {}, {}, None),
    }
    lits = extract_equality_literals(["SELECT * FROM ol WHERE ol.IDC = 125"])
    assert lits == {"IDC": ["125"]}
    tables = generate_tables(spark, schema, stats, scale=1.0, literals=lits)
    ol = tables["OrderLine"]
    n_match = ol.filter("IDC = 125").count()
    # ~1/200 of 2000 rows — uniform hash wobble, never zero
    assert 1 <= n_match <= 40
    # swap preserves referential integrity: every FK value hits a parent
    custs = tables["Customer"].select("IDC")
    orphans = ol.join(custs, "IDC", "left_anti").count()
    assert orphans == 0


def test_generator_multi_literal_seeds_compose_as_permutation(spark):
    """Two numeric literals on ONE field must BOTH be emitted: sequential
    when-chains over the raw bucket let a later literal's swap shadow an
    earlier literal's target bucket (e.g. literals [5, 0]: the swap for 0
    re-mapped bucket 0 away from 5, erasing 5 from the data).  The seeds
    are composed into a single permutation instead."""
    from bigdatastructure_a5_spark.sources.generator import generate_tables
    from bigdatastructure_a5_spark.sources.json_config import CollectionStats

    schema = {
        "T": {
            "primary_key": "IDT",
            "fields": {
                "IDT": {"type": "integer", "avg_size": 8},
                "K": {"type": "integer", "avg_size": 8},
            },
        }
    }
    stats = {"T": CollectionStats(1000, {"K": 10}, {}, {}, None)}
    t = generate_tables(
        spark, schema, stats, scale=1.0, literals={"K": ["5", "0"]}
    )["T"]
    counts = {r.K: r.n for r in t.groupBy("K").count().withColumnRenamed("count", "n").collect()}
    # both literals present, each at ~1/10 of 1000 rows (uniform wobble)
    assert counts.get(5, 0) >= 50, counts
    assert counts.get(0, 0) >= 50, counts
    # the permutation keeps the value space intact: 10 distinct values
    assert len(counts) == 10, counts


def test_generator_string_pk_fk_join(spark):
    """A string-typed primary key must produce joinable FK values (the FK
    draws from the parent's pk representation, not the field's declared
    type)."""
    from bigdatastructure_a5_spark.sources.generator import generate_tables
    from bigdatastructure_a5_spark.sources.json_config import CollectionStats

    schema = {
        "Dim": {
            "primary_key": "code",
            "fields": {"code": {"type": "string", "avg_size": 8}},
        },
        "Fact": {
            "primary_key": "fid",
            "fields": {
                "fid": {"type": "integer", "avg_size": 8},
                "code": {"type": "string", "avg_size": 8},
            },
        },
    }
    stats = {
        "Dim": CollectionStats(50, {"code": 50}, {}, {}, None),
        "Fact": CollectionStats(500, {"code": 50}, {}, {}, None),
    }
    tables = generate_tables(spark, schema, stats, scale=1.0)
    dim, fact = tables["Dim"], tables["Fact"]
    assert dict(dim.dtypes)["code"] == "string"
    assert dict(fact.dtypes)["code"] == "string"
    assert fact.join(dim, "code", "left_anti").count() == 0
    assert fact.join(dim, "code").count() == 500


def test_query_simulator_cli_executes_q1_q5(spark):
    """The reference's third entry point (`main.py --db DB1` /
    `python -m query_simulator`): Q1-Q5 over Product/Stock/OrderLine/
    Client/Warehouse, here executed for real on a generated corpus.
    Pins: reference query names/order, every query returns rows (the
    literals are seeded / probed from data), Q3's date filter selects
    ~1/date-NDV of order lines, and an unknown signature raises."""
    import pytest

    from bigdatastructure_a5_spark.examples.query_simulator_demo import (
        scaled_stats,
        simulate_queries,
    )

    results = simulate_queries(spark, "DB1", scale=1e-5)
    names = [r["query"]["name"] for r in results]
    assert names == [
        "Q1_stock_lookup",
        "Q2_brand_filter",
        "Q3_orders_by_date",
        "Q4_brand_stock_join",
        "Q5_orders_brand_client_join",
    ]
    rows = {r["query"]["name"]: r["total"]["rows"] for r in results}
    assert all(n >= 1 for n in rows.values()), rows
    st = scaled_stats(1e-5)
    ol = st["OrderLine"].nb_documents
    date_ndv = st["OrderLine"].distinct_values["odate"]
    expect = ol / date_ndv
    assert expect / 3 <= rows["Q3_orders_by_date"] <= expect * 3, (
        rows,
        expect,
    )
    # measured costs are present and priced
    assert all(r["total"]["time_cost"] >= 0 for r in results)
    with pytest.raises(ValueError):
        simulate_queries(spark, "DB9")


def test_query_simulator_layouts_agree_cross_signature(spark):
    """The five db signatures materialize different physical layouts of
    the SAME logical data, so layout-routed Q1-Q5 must agree on answers:
    exactly equal wherever the layout stores complete information, and
    never exceeding the normalized answer on the two documented
    reconstruction layouts (DB3 rebuilds products from Stock, DB4 from
    OrderLine — rows for never-hosted products are simply not stored)."""
    from bigdatastructure_a5_spark.examples.query_simulator_demo import (
        simulate_queries,
    )

    rows = {}
    for sig in ("DB1", "DB2", "DB3", "DB4", "DB5"):
        rows[sig] = {
            r["query"]["name"]: r["total"]["rows"]
            for r in simulate_queries(spark, sig, scale=1e-6)
        }
    base = rows["DB1"]
    # complete-information layouts answer identically on every query
    assert rows["DB2"] == base
    # Q1 (stock point lookup) and Q3 (date filter) are stored completely
    # on every layout
    for sig in ("DB3", "DB4", "DB5"):
        assert rows[sig]["Q1_stock_lookup"] == base["Q1_stock_lookup"]
        assert rows[sig]["Q3_orders_by_date"] == base["Q3_orders_by_date"]
    # DB5 stores order lines embedded but products/stock complete
    assert rows["DB5"] == base
    # reconstruction layouts: never above the normalized answer
    for sig in ("DB3", "DB4"):
        for q in ("Q2_brand_filter", "Q4_brand_stock_join",
                  "Q5_orders_brand_client_join"):
            assert 0 <= rows[sig][q] <= base[q], (sig, q, rows[sig][q], base[q])


def test_literal_extraction_ignores_quoted_spans_and_unescapes():
    """The workload-literal extractor must (1) not read `x = 5` inside a
    string constant as a numeric predicate on x, and (2) un-escape SQL
    quote doubling so the seeded string literal is the value the predicate
    actually compares against."""
    from bigdatastructure_a5_spark.sources.generator import (
        extract_equality_literals,
    )

    out = extract_equality_literals(
        ["WHERE note = 'priority = 5 stuff' AND x = 12"]
    )
    assert out == {"note": ["priority = 5 stuff"], "x": ["12"]}
    out2 = extract_equality_literals(["WHERE note = 'it''s here' AND q = 7"])
    assert out2 == {"note": ["it's here"], "q": ["7"]}

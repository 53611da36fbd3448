"""Oracle-type lint: no registered DuckDB oracle may emit a column type
Spark cannot produce.

Why this exists: DuckDB promotes ``SUM(BIGINT) OVER (...)`` to HUGEINT and
downstream arithmetic inherits it.  Values stringify identically to the
Spark-side bigint, so every local exact-value check passes — but the
driver's value hash folds in the physical type, and the row stays red
(the ``pack_chunks`` failure of rounds 9-10, root-caused in VERDICT r10).
This lint planning-probes EVERY registered oracle (plus the lifted x-N
variants) and fails on any output column whose DuckDB type has no Spark
equivalent, so the class cannot recur.

No Spark session needed: ``duckdb.sql(...).types`` plans without
executing, so even the quadratic pair-oracles lint in milliseconds.
"""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bigdatastructure_a5_spark.catalog import TABLES, table_path
from bigdatastructure_a5_spark.registry import REGISTRY, _load_all

#: DuckDB result types with no Spark Catalyst equivalent.  HUGEINT /
#: UHUGEINT are 128-bit; the U-ints are unsigned.  Spark has none of
#: these, so an oracle emitting one can never hash-match the engine.
NON_SPARK_NATIVE = (
    "HUGEINT",
    "UHUGEINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def _bad_columns(con, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)  # plans only — no execution
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(bad in str(t).upper() for bad in NON_SPARK_NATIVE)
    ]


def test_every_registered_oracle_is_spark_native(duck):
    _load_all()
    offenders = {}
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            continue
        bad = _bad_columns(duck, qd.oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emit types Spark cannot produce (driver hash-red even "
        f"when values stringify identically): {offenders} — wrap the "
        "offending expressions in CAST(... AS BIGINT/DOUBLE)"
    )


def test_every_lifted_oracle_is_spark_native(duck):
    """The x-N lifted oracles substitute for registered ones above x10
    (tools/check_correctness.py) — same lint applies or the local
    checker certifies a false green at scale."""
    from lifted_oracles import lifted_oracles

    _load_all()
    offenders = {}
    for name, sql in lifted_oracles(copies=10).items():
        bad = _bad_columns(duck, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, f"lifted oracles emit non-Spark types: {offenders}"


def test_lint_catches_uncasted_window_sum(duck):
    """Self-check: a deliberately un-casted SUM-window (the exact shape
    that made pack_chunks red for two rounds) must be flagged."""
    scratch = """
        SELECT doc_id,
               SUM(n_chars) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    """
    bad = _bad_columns(duck, scratch)
    assert bad == [("cum", "HUGEINT")], bad


def test_checker_kind_fails_hugeint():
    """tools/check_correctness._kind must FAIL (not bucket) oracle-side
    types Spark can't emit — the checker has to be strictly stricter
    than the driver on every axis or it certifies false greens."""
    import inspect

    import check_correctness as cc

    src = inspect.getsource(cc)
    # the duck-side guard exists and hugeint is no longer bucketed to int
    assert "non-spark-native" in src
    assert '"int", "long", "short", "byte", "hugeint"' not in src

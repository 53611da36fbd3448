"""Smoke: the driver contract functions work end-to-end."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("__spark_entry__", REPO / "__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = entry_mod
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"p_partkey", "p_brand", "n_lines", "avg_price"}


def test_every_query_has_callable_and_most_have_oracles(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 18
    for name in oracles:
        assert name in qs
    # oracle coverage must stay high: non-SQL-expressible ops only may omit.
    assert len(oracles) >= 0.7 * len(qs)


def test_all_queries_run_nonempty_at_sf0001(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() > 0, f"{name} returned no rows at sf0.001"

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


def test_cluster_profile_matches_coverage_deploy_table():
    """VERDICT r6 item 6: the COVERAGE.md deploy checklist is executable
    (session.cluster_overrides / get_spark(profile='cluster')) and this
    test is the drift lock — every conf the profile emits must appear,
    with its value, in the checklist's table row; editing either side
    alone fails here."""
    import re
    from pathlib import Path

    from bigdatastructure_a5_spark.session import (
        CLUSTER_TOTAL_CORES,
        cluster_overrides,
    )

    section = (
        (Path(__file__).resolve().parent.parent / "COVERAGE.md")
        .read_text()
        .split("## Deploy checklist", 1)[1]
    )
    ov = cluster_overrides()
    assert ov["spark.sql.shuffle.partitions"] == str(3 * CLUSTER_TOTAL_CORES)
    # spark.default.parallelism rides the shuffle-partitions row (the code
    # default sets both from one number; the override must keep them equal)
    assert ov["spark.default.parallelism"] == ov["spark.sql.shuffle.partitions"]
    row_token = {
        "spark.sql.shuffle.partitions": ov["spark.sql.shuffle.partitions"],
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256",
        "spark.sql.files.maxPartitionBytes": "256 MiB",
        "spark.driver.memory": "64g",
        "spark.sql.streaming.stateStore.providerClass": "RocksDB",
    }
    for key, token in row_token.items():
        rows = [
            line
            for line in section.splitlines()
            if line.startswith(f"| `{key}`")
        ]
        assert len(rows) == 1, f"deploy table must have exactly one {key} row"
        # the token must sit in the OVERRIDE column (3rd), not just anywhere
        override_col = rows[0].split("|")[3]
        assert token in override_col, (key, token, override_col)
    # value sanity: the emitted strings are what the table's prose means
    assert ov["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "256m"
    assert ov["spark.sql.files.maxPartitionBytes"] == "256m"
    assert re.search(r"RocksDBStateStoreProvider$",
                     ov["spark.sql.streaming.stateStore.providerClass"])
    # and an unknown profile is a loud error, not a silent local session
    import pytest

    from bigdatastructure_a5_spark.session import get_spark

    with pytest.raises(ValueError, match="profile"):
        get_spark(profile="staging")


def test_persist_df_honors_storage_level_env(spark, monkeypatch):
    """session.persist_df routes every tracked-intermediate persist through
    the SPARK_GRAFT_PERSIST_LEVEL knob (EXPERIMENTS §11: DISK_ONLY is the
    starved-executor mitigation); an unknown level is a loud error."""
    import pytest

    from bigdatastructure_a5_spark.session import persist_df

    df = spark.range(10)
    try:
        monkeypatch.setenv("SPARK_GRAFT_PERSIST_LEVEL", "DISK_ONLY")
        p = persist_df(df)
        assert p.storageLevel.useDisk and not p.storageLevel.useMemory
        p.unpersist()

        monkeypatch.setenv("SPARK_GRAFT_PERSIST_LEVEL", "NOT_A_LEVEL")
        with pytest.raises(ValueError, match="NOT_A_LEVEL"):
            persist_df(df)

        monkeypatch.delenv("SPARK_GRAFT_PERSIST_LEVEL")
        p = persist_df(df)
        assert p.storageLevel.useMemory  # Spark's DataFrame default
    finally:
        df.unpersist()

"""Driver-contract regression guard: the __spark_entry__ surface must work
when the SparkSession is created from a FOREIGN working directory (the
harness controls its own cwd).  Catches the class of bug where the driver
process can import the package but the Python workers cannot
(ModuleNotFoundError on pandas-UDF closures) — see
session.ensure_workers_can_import."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = """
import importlib.util, sys
from pyspark.sql import SparkSession
spec = importlib.util.spec_from_file_location("__spark_entry__", r"{entry}")
m = importlib.util.module_from_spec(spec); sys.modules["__spark_entry__"] = m
spec.loader.exec_module(m)
spark = SparkSession.builder.master("local[2]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert len(m.entry(spark).collect()) > 0
qs = m.queries()
assert set(m.oracle_sql()) <= set(qs)
# a mapInPandas query: fails without worker-side package shipping
n = qs["multimodal_decode"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("CONTRACT_OK", len(qs))
"""


def test_entry_contract_from_foreign_cwd(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(entry=REPO / "__spark_entry__.py")],
        cwd=str(tmp_path),  # NOT the repo
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT_OK" in out.stdout

"""Per-column divergence diagnostic for the pack_chunks gate query.

VERDICT r9 item 1: the driver reported rows/schema green but value-hash
red for ``pack_chunks``, and the judge could not reproduce it locally.
If the row goes red again, this tool identifies WHICH column diverges
from the artifact alone: it runs the registered Spark query and its
DuckDB oracle on the same fixture dir and prints, per column, a
canonical checksum (sha256 of the sorted stringified column multiset,
the same cell canonicalization as tools/check_correctness.py) plus
sum/min/max for the numeric columns — then, if anything differs, the
first few rows present on one side only.

Usage:  python tools/pack_diagnose.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatastructure_a5_spark.catalog import TABLES, table_path
from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def column_report(name: str, values: list) -> dict:
    canon = sorted(_canon_cell(v) for v in values)
    digest = hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]
    nums = [v for v in values if isinstance(v, (int, float))]
    rep = {"checksum": digest, "n": len(values)}
    if nums:
        rep |= {"sum": sum(nums), "min": min(nums), "max": max(nums)}
    return rep


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _load_all()
    qd = REGISTRY["pack_chunks"]

    spark = get_spark("pack-diagnose")
    spark_rows = qd.builder(spark, sf_dir).collect()
    spark_cols = list(spark_rows[0].asDict()) if spark_rows else []

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    cur = con.sql(qd.oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    print(f"fixture: {sf_dir}")
    print(f"rows: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    diverged = []
    for col in sorted(set(spark_cols) | set(oracle_cols)):
        s = column_report(col, [r[col] for r in spark_rows]) if col in spark_cols else None
        o = (
            column_report(col, [r[oracle_cols.index(col)] for r in oracle_rows])
            if col in oracle_cols
            else None
        )
        ok = s is not None and o is not None and s["checksum"] == o["checksum"]
        if not ok:
            diverged.append(col)
        print(f"  {col:14s} {'OK ' if ok else 'DIVERGED'} spark={s} oracle={o}")

    if diverged:
        cols = sorted(set(spark_cols) & set(oracle_cols))
        s_set = {tuple(_canon_cell(r[c]) for c in cols) for r in spark_rows}
        o_set = {
            tuple(_canon_cell(r[oracle_cols.index(c)]) for c in cols)
            for r in oracle_rows
        }
        print(f"columns ({', '.join(cols)}) — rows only in spark:")
        for row in sorted(s_set - o_set)[:5]:
            print(f"  {row}")
        print("rows only in oracle:")
        for row in sorted(o_set - s_set)[:5]:
            print(f"  {row}")
    spark.stop()
    print("DIVERGED: " + (", ".join(diverged) if diverged else "none"))
    return 1 if diverged else 0


if __name__ == "__main__":
    raise SystemExit(main())

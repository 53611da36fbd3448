"""Dump ``explain("formatted")`` for registry queries to ``plans/<tag>/``.

Optimization-round evidence tool (guide §1: capture the plan shape before
and after each change).  For every named query (default: all) the builder
runs against ``sf_dir`` and two artifacts are appended to one file,
``plans/<tag>/<query>_<suffix>.txt``:

1. the PRE-EXECUTION formatted plan of the returned frame — join
   strategies, Exchange placement, PushedFilters/ReadSchema as the
   optimizer planned them;
2. for multi-pass operators that materialize internally
   (session.materialize_release), the EXECUTED materialization pipeline's
   formatted plan, captured via MATERIALIZATION_OBSERVER — the returned
   frame for those is just a cache read, so the observer plan is the one
   that does the work.

Usage: python tools/dump_plans.py SUFFIX [SF_DIR] [QUERY ...]
e.g.:  python tools/dump_plans.py before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatastructure_a5_spark import session as S
from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark

# round tag via env so the usage line stays SUFFIX [SF_DIR] [QUERY ...]
OUT_ROOT = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("SPARK_GRAFT_PLANS_TAG", "r15")
)


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    _load_all()
    todo = sorted(names or REGISTRY)
    OUT_ROOT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in todo:
        mat_plans: list[str] = []
        S.MATERIALIZATION_OBSERVER = lambda df: mat_plans.append(
            formatted_plan(df)
        )
        try:
            spark.sparkContext.setJobDescription(f"dump_plans: {name}")
            df = REGISTRY[name].builder(spark, sf_dir)
            parts = [
                f"== {name} ({suffix}) @ {os.path.basename(sf_dir)} ==\n",
                formatted_plan(df),
            ]
            for i, p in enumerate(mat_plans):
                parts.append(
                    f"\n== materialization pipeline {i + 1} "
                    "(executed plan at the internal persist point) ==\n"
                )
                parts.append(p)
            out = OUT_ROOT / f"{name}_{suffix}.txt"
            out.write_text("\n".join(parts))
            print(f"wrote {out}")
        finally:
            S.MATERIALIZATION_OBSERVER = None
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

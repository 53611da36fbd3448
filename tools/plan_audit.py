"""Physical-plan audit over every registry query.

For each query, record the properties the 100-TB design depends on straight
from the executed plan: parquet pushdown (PushedFilters), column pruning
(ReadSchema width), exchange (shuffle) count, broadcast joins, whole-stage
codegen coverage, and rows out.  Writes PLAN_AUDIT.md at the repo root —
reviewable evidence that the plans are the plans we claim.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatastructure_a5_spark.plans.metrics import run_with_metrics
from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark


def _top_level_fields(schema_body: str) -> int:
    """Top-level field count of a ReadSchema struct body: commas at
    angle-bracket depth 0 (+1).  Counting every ':' instead would count a
    nested struct's members as extra read columns — wrong in exactly the
    embedded-document cases the audit's column-pruning evidence is about.
    (Formatted explain may truncate very wide schemas with '... N more
    fields'; the parsed count is then a lower bound.)"""
    body = schema_body.rstrip(">")
    if not body.strip():
        return 0
    depth = 0
    fields = 1
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
    return fields


def audit_plan(plan: str) -> dict[str, object]:
    """Parse a FORMATTED explain string.

    An EXECUTED adaptive plan prints the FINAL plan tree, then the initial
    plan tree, then ONE shared pool of numbered '(N) NodeName' detail
    blocks covering both trees — so operator counts must come from the
    final TREE's node references, and detail-derived facts (PushedFilters,
    ReadSchema, codegen ids) from only the detail blocks the final tree
    references.  Counting all detail entries would double-count whatever
    AQE re-planned; counting only pre-'Initial Plan' text would miss the
    details entirely.  A plan can hold SEVERAL Final Plan sections — each
    adaptively-executed subquery prints its own AdaptiveSparkPlan with its
    own Final/Initial pair — so every '== Final Plan ==' occurrence is
    parsed and their node sets unioned (parsing only the first would drop
    the subquery subtrees' operators).  Non-adaptive plans (no Final Plan
    marker) keep the plain detail-entry parse."""
    if "== Final Plan ==" in plan:
        # one node per tree line; the node NAME is the first word after the
        # tree art and the id is the first '(N)' on the line.  A word-pair
        # regex would misparse multi-word refs — 'Scan parquet  (1)',
        # 'BroadcastHashJoin Inner BuildRight (6)' — dropping scans or
        # attributing the join to 'BuildRight'
        pairs = []
        for section in plan.split("== Final Plan ==")[1:]:
            tree = section.split("== Initial Plan ==", 1)[0]
            for line in tree.splitlines():
                mid = re.search(r"\((\d+)\)", line)
                mname = re.match(r"[\s+\-:*]*([A-Za-z]+)", line)
                if mid and mname:
                    pairs.append((mname.group(1), mid.group(1)))
        nodes = [name for name, _ in pairs]
        final_ids = {i for _, i in pairs}
        blocks = re.split(r"^\((\d+)\) ", plan, flags=re.MULTILINE)
        detail_text = "\n".join(
            f"({blocks[i]}) {blocks[i + 1]}"
            for i in range(1, len(blocks) - 1, 2)
            if blocks[i] in final_ids
        )
    else:
        nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.MULTILINE)
        detail_text = plan

    def n(name: str) -> int:
        return sum(1 for x in nodes if x == name)

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", detail_text)
    read_schemas = re.findall(r"ReadSchema: struct<([^\n]*)", detail_text)
    return {
        "scans": n("Scan") + n("FileScan"),
        "read_cols": sum(_top_level_fields(s) for s in read_schemas),
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "exchanges": n("Exchange"),
        "broadcasts": n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin"),
        "smj": n("SortMergeJoin"),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", detail_text))),
        "python": n("MapInPandas") + n("ArrowEvalPython")
        + n("FlatMapGroupsInPandas") + n("FlatMapGroupsInPandasWithState"),
        "topk": "TakeOrderedAndProject" in detail_text,
    }


def audit_tree(tree: str) -> dict[str, object]:
    """Operator counts from a plain ``SparkPlan.toString`` tree (the
    materialization pipelines are captured as the cached plan's executed
    AdaptiveSparkPlan dump, not a formatted explain).  Only the Final Plan
    section is counted — the dump appends the Initial Plan for reference,
    and counting both would double every exchange AQE kept."""
    final = tree.split("== Initial Plan ==", 1)[0]

    def c(pat: str) -> int:
        return len(re.findall(pat, final))

    return {
        # \bExchange\b does not match BroadcastExchange/ReusedExchange
        "exchanges": c(r"\bExchange\b"),
        "broadcasts": c(r"\bBroadcastHashJoin\b|\bBroadcastNestedLoopJoin\b"),
        "smj": c(r"\bSortMergeJoin\b"),
        "scans": c(r"\bScan parquet\b|\bFileScan\b|\bScan ExistingRDD\b"),
        "cache_reads": c(r"\bInMemoryTableScan\b"),
        "python": c(
            r"\bMapInPandas\b|\bArrowEvalPython\b|\bFlatMapGroupsInPandas\b"
        ),
        "finalized": "isFinalPlan=true" in tree,
    }


def _cached_plan_string(df) -> str | None:
    """The EXECUTED plan of the pipeline that filled ``df``'s cache.

    After materialize_release's count(), the frame's executed plan is an
    InMemoryTableScan whose InMemoryRelation holds the cached plan — an
    AdaptiveSparkPlanExec that the cache fill ran to completion, so its
    toString is the final (isFinalPlan=true) form of the real work.  The
    walk descends py4j children plus AdaptiveSparkPlanExec's current plan
    (not a child field)."""

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "InMemoryTableScan" in cls:
            return node
        ch = node.children()
        for i in range(ch.size()):
            r = walk(ch.apply(i))
            if r is not None:
                return r
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan())
        return None

    try:
        scan = walk(df._jdf.queryExecution().executedPlan())
        if scan is None:
            return None
        return scan.relation().cachedPlan().toString()
    except Exception:  # noqa: BLE001 — audit-only; never break the query
        return None


def materialization_section(rows: list[str]) -> list[str]:
    return [
        "",
        "## Materialization pipelines (dedup / curation / near-dup)",
        "",
        "Queries that go through `session.materialize_release` answer from "
        "a small result cache, so their main-table row describes only the "
        "terminal cache-read job.  These rows audit the EXECUTED plan of "
        "the pipeline that filled the cache (captured via "
        "`session.MATERIALIZATION_OBSERVER` as the cached plan's final "
        "adaptive form) — the job where the real exchanges live.  "
        "`cache reads` are persisted intermediates (shingle sets, bucket "
        "tables) consumed by the pipeline's self-joins.",
        "",
        "| query | pipeline | exchanges | broadcast joins | SMJ | "
        "parquet scans | cache reads | python stages | finalized |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
        *rows,
    ]


def bucketed_layout_section(spark, sf_dir: str) -> list[str]:
    """Audit rows for the sharded-layout contrast (VERDICT r3 item 4): the
    same logical queries as ``agg_on_orderkey`` / ``join_equi_inner`` on
    BOTH layouts — plain parquet (shuffles on the key) and a bucketed
    ``write_variant`` layout (zero Exchange) — the physical realization of
    the reference's sharded/unsharded Q6/Q7 contrast
    (`query_simulator/aggregate.py:218-236`)."""
    from pyspark.sql import functions as F

    from bigdatastructure_a5_spark.catalog import load_table
    from bigdatastructure_a5_spark.operators.denormalize import (
        CollectionSpec,
        DenormalizationSpec,
        write_variant,
    )

    spec = DenormalizationSpec(
        id="AUDIT",
        description="normalized layout, fact tables sharded on orderkey",
        collections=(
            CollectionSpec("lineitem", sharding_key="l_orderkey"),
            CollectionSpec("orders", sharding_key="o_orderkey"),
        ),
        embeds=(),
    )
    base = {
        "lineitem": load_table(spark, sf_dir, "lineitem"),
        "orders": load_table(spark, sf_dir, "orders"),
    }
    tables = write_variant(spark, base, spec, buckets=8, table_prefix="audit_")
    b_li = spark.table(tables["lineitem"])
    b_o = spark.table(tables["orders"])

    def cases(li, o):
        return {
            "agg on shard key (agg_on_orderkey)": li.groupBy(
                "l_orderkey"
            ).agg(F.count(F.lit(1)).alias("n")),
            "fact-x-fact join on shard key (join_equi_inner)": li.join(
                o, li.l_orderkey == o.o_orderkey
            ).select("l_orderkey", "o_totalprice"),
            "agg OFF shard key (reference Q7 contrast)": li.groupBy(
                "l_partkey"
            ).agg(F.count(F.lit(1)).alias("n")),
        }

    # disable broadcast so the join contrast shows shuffle vs co-located
    # SMJ (at audit scale everything fits the broadcast threshold).  Save
    # the SESSION values to restore — unset would fall back to Spark's
    # built-in 10MB default, not the 64MB get_spark configures, changing
    # join strategies for anything audited after this section.
    bcast_keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    prior = {k: spark.conf.get(k, None) for k in bcast_keys}
    for k in bcast_keys:
        spark.conf.set(k, "-1")
    rows = []
    try:
        for layout, (li, o) in (
            ("parquet (unsharded)", (base["lineitem"], base["orders"])),
            ("bucketed write_variant (sharded)", (b_li, b_o)),
        ):
            for case, df in cases(li, o).items():
                # collect() executes the DataFrame's own QueryExecution so
                # the explain shows the FINAL adaptive plan (see main())
                df.collect()
                qe = df._jdf.queryExecution()
                mode = (
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                a = audit_plan(qe.explainString(mode))
                rows.append(
                    f"| {case} | {layout} | {a['exchanges']} | {a['smj']} |"
                )
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return [
        "",
        "## Bucketed (sharded) layout contrast",
        "",
        "Same logical queries on the plain-parquet layout vs a "
        "`write_variant` layout bucketed on the sharding key (8 buckets, "
        "broadcast disabled to expose the join's shuffle behavior).  "
        "Bucketing is the engine's shard placement: on-key operations run "
        "shuffle-free (reference Q6 sharded), off-key operations still pay "
        "the exchange (reference Q7).",
        "",
        "| case | layout | exchanges | sort-merge joins |",
        "| --- | --- | --- | --- |",
        *rows,
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _load_all()
    import tempfile

    spark = get_spark(
        "plan-audit",
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="audit_wh_")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# PLAN_AUDIT — physical-plan properties per registry query",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}` "
        "(operator counts parsed from the FINAL adaptive plan of an "
        "executed run — AQE runtime re-planning included).  Queries that "
        "materialize their result (dedup, curation: materialize_release "
        "caches the answer) report the terminal cache-read job in THIS "
        "table; the pipeline that actually does the work is audited "
        "separately in the 'Materialization pipelines' section below.  "
        "Shuffle bytes here are complete (they include the cache fill).",
        "",
        "| query | scans | cols read | pushed filters | exchanges | broadcast | SMJ | codegen spans | python stages | top-k | scan MiB | shuffle MiB | rows |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    import bigdatastructure_a5_spark.session as _session

    mat_rows: list[str] = []
    for name, qd in sorted(REGISTRY.items()):
        captures: list[str] = []
        _session.MATERIALIZATION_OBSERVER = lambda df, c=captures: c.append(
            _cached_plan_string(df)
        )
        try:
            df = qd.builder(spark, sf_dir)
        finally:
            _session.MATERIALIZATION_OBSERVER = None
        for i, tree in enumerate(captures):
            if tree is None:
                mat_rows.append(f"| {name} | {i} | (capture failed) |")
                continue
            t = audit_tree(tree)
            mat_rows.append(
                f"| {name} | {i} | {t['exchanges']} | {t['broadcasts']} | "
                f"{t['smj']} | {t['scans']} | {t['cache_reads']} | "
                f"{t['python']} | {'yes' if t['finalized'] else 'NO'} |"
            )
        qm = run_with_metrics(spark, df, name)
        # collect() executes the DataFrame's OWN QueryExecution, so the
        # explain below prints the FINAL adaptive plan (isFinalPlan=true —
        # AQE runtime re-planning included), matching the header's claim;
        # the noop-write above runs a separate execution for byte metrics
        df.collect()
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = qe.explainString(mode)
        a = audit_plan(plan)
        lines.append(
            f"| {name} | {a['scans']} | {a['read_cols']} | {a['pushed_filters']} | "
            f"{a['exchanges']} | {a['broadcasts']} | {a['smj']} | {a['codegen']} | "
            f"{a['python']} | {'yes' if a['topk'] else ''} | "
            f"{qm.scanned_bytes / 2**20:.2f} | {qm.shuffle_bytes / 2**20:.3f} | "
            f"{int(qm.output_rows)} |"
        )
    if mat_rows:
        lines.extend(materialization_section(mat_rows))
    lines.extend(bucketed_layout_section(spark, sf_dir))
    out = Path(__file__).resolve().parent.parent / "PLAN_AUDIT.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

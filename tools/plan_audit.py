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
    details entirely.

    Two structural hazards handled by the stateful line scan:
    - SEVERAL Final Plan sections: each adaptively-executed subquery
      prints its own AdaptiveSparkPlan with its own Final/Initial pair;
      all final sections are unioned (parsing only the first would drop
      the subquery subtrees' operators).
    - CACHED queries: the tree expands every InMemoryRelation's cached
      AdaptiveSparkPlan INLINE (same id numbering space, its own nested
      Final/Initial markers, repeated at every read site).  Those
      subtrees are the materialization pipelines — audited separately by
      `_materialization_audits` — so everything indented under an
      InMemoryRelation line is skipped here, keeping this parse true to
      the header's 'terminal job' claim and immune to the double-print of
      a cache read twice.

    Node names are the first word of the line body ('Scan parquet  (1)',
    'BroadcastHashJoin Inner BuildRight (6)' — a word-pair regex would
    drop scans or attribute the join to 'BuildRight'); the id must END
    the line so expression text's mid-line '(32)' tokens never match.
    Non-adaptive plans (no Final Plan marker) keep the plain
    detail-entry parse."""
    if "== Final Plan ==" in plan:
        pairs: set[tuple[str, str]] = set()
        in_final = False
        skip_pos = None  # indent of the InMemoryRelation being skipped
        for line in plan.splitlines():
            body = line.lstrip(" :+-*")
            pos = len(line) - len(body)
            if skip_pos is not None:
                if pos > skip_pos:
                    continue  # inside a cached-plan expansion
                skip_pos = None
            if "== Final Plan ==" in line:
                in_final = True
                continue
            if "== Initial Plan ==" in line:
                in_final = False
                continue
            mid = re.search(r"\((\d+)\)\s*$", line)
            mname = re.match(r"([A-Za-z]+)", body)
            if mname and mname.group(1) == "InMemoryRelation":
                # start skipping REGARDLESS of in_final: an expansion
                # inside the initial tree would otherwise flip in_final
                # back on via its nested '== Final Plan ==' marker
                skip_pos = pos
            if in_final and mid and mname:
                pairs.add((mname.group(1), mid.group(1)))
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


#: Physical-node classes -> audit columns for the materialization walk.
_PY_STAGE_CLASSES = (
    "MapInPandasExec",
    "ArrowEvalPythonExec",
    "FlatMapGroupsInPandasExec",
    "FlatMapGroupsInPandasWithStateExec",
    "BatchEvalPythonExec",
)


def _walk_physical(node, visit) -> None:
    """THE py4j physical-tree descent, shared by every audit walk: calls
    ``visit(cls, node)`` per node and stops descending a subtree when it
    returns False.  Wrapper nodes are transparent — AdaptiveSparkPlanExec
    descends via its current executed plan, QueryStage wrappers via
    ``.plan()`` — and handled in exactly ONE place, so a new wrapper class
    (as ResultQueryStageExec was in 4.x) needs patching here only."""
    cls = node.getClass().getSimpleName()
    if visit(cls, node) is False:
        return
    if cls == "AdaptiveSparkPlanExec":
        _walk_physical(node.executedPlan(), visit)
        return
    if cls.endswith("QueryStageExec"):
        _walk_physical(node.plan(), visit)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk_physical(ch.apply(i), visit)


def _count_nodes(root) -> dict[str, int]:
    """Operator counts by walking the ACTUAL physical-plan node tree over
    py4j — no string parsing, so nested InMemoryRelation dumps (whose
    toString embeds entire other pipelines) cannot pollute the counts.
    Reused* nodes are counted but not descended (their subtree already ran
    once elsewhere)."""
    counts: dict[str, int] = {}

    def visit(cls, _node):
        counts[cls] = counts.get(cls, 0) + 1
        if cls.startswith("Reused"):
            return False
        return True

    _walk_physical(root, visit)
    return counts


def _is_finalized(root) -> bool:
    """Whether an adaptive plan ran to completion.  Primary signal is the
    version-stable ``AdaptiveSparkPlanExec.isFinalPlan()`` (the same flag
    formatted explain prints); fallback for a py4j surprise is the 4.x
    structural heuristic (a ResultQueryStage at the root).  Non-adaptive
    roots have no staging to finalize."""
    if root.getClass().getSimpleName() != "AdaptiveSparkPlanExec":
        return True
    try:
        return bool(root.isFinalPlan())
    except Exception:  # noqa: BLE001 — audit-only fallback
        return (
            root.executedPlan().getClass().getSimpleName()
            == "ResultQueryStageExec"
        )


def _summarize_counts(
    counts: dict[str, int], finalized: bool
) -> dict[str, object]:
    def c(*names: str) -> int:
        return sum(counts.get(n, 0) for n in names)

    return {
        "exchanges": c("ShuffleExchangeExec"),
        "bcast_ex": c("BroadcastExchangeExec"),
        "bhj": c("BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec"),
        "smj": c("SortMergeJoinExec"),
        "scans": c("FileSourceScanExec", "BatchScanExec"),
        "cache_reads": c("InMemoryTableScanExec"),
        "python": c(*_PY_STAGE_CLASSES),
        "finalized": finalized,
    }


def _materialization_audits(df) -> list[tuple[str, dict[str, object]]]:
    """Audit every pipeline behind ``df``'s cache: the result-filling plan
    itself, plus (recursively) the cached plan of each persisted
    INTERMEDIATE it reads — multi-pass operators (minhash, jaccard,
    curation) put the heavy joins in those intermediate fills, so auditing
    only the outermost plan would still hide the real exchanges.  Each
    cached plan is an AdaptiveSparkPlanExec the cache fill ran to
    completion (final form).  Returns (label, summary) pairs, outermost
    first; deduped by structural hashCode so a cache read twice (e.g. a
    self-join's two sides) is audited once."""

    def find_scans(node, acc):
        def visit(cls, n):
            if "InMemoryTableScan" in cls:
                acc.append(n)
                return False
            return True

        _walk_physical(node, visit)

    out: list[tuple[str, dict[str, object]]] = []
    seen: set[int] = set()
    try:
        roots = []
        find_scans(df._jdf.queryExecution().executedPlan(), roots)
        if not roots:
            return []
        frontier = [("result", roots[0].relation().cachedPlan())]
        depth = 0
        while frontier and depth < 6:  # cycle/bug backstop
            nxt = []
            for label, plan in frontier:
                h = plan.hashCode()
                if h in seen:
                    continue
                seen.add(h)
                out.append(
                    (
                        label,
                        _summarize_counts(
                            _count_nodes(plan), _is_finalized(plan)
                        ),
                    )
                )
                inner: list = []
                find_scans(plan, inner)
                for j, scan in enumerate(inner):
                    nxt.append(
                        (f"{label}>cache{j}", scan.relation().cachedPlan())
                    )
            frontier = nxt
            depth += 1
        if frontier:
            # backstop tripped: say so instead of silently dropping the
            # deeper pipelines — the heavy joins could be exactly there
            out.append((f"TRUNCATED at depth {depth} ({len(frontier)} more)", None))
    except Exception:  # noqa: BLE001 — audit-only; never break the query
        return [("capture-failed", None)]
    return out


def materialization_section(rows: list[str]) -> list[str]:
    return [
        "",
        "## Materialization pipelines (dedup / curation / near-dup)",
        "",
        "Queries that go through `session.materialize_release` answer from "
        "a small result cache, so their main-table row describes only the "
        "terminal cache-read job.  These rows audit the EXECUTED plans "
        "that filled the caches (captured via "
        "`session.MATERIALIZATION_OBSERVER`, counted by walking the "
        "physical node tree — no string parsing): the `result` row is the "
        "final cache-filling plan, and each `>cacheN` row is the pipeline "
        "behind a persisted INTERMEDIATE it reads (shingle sets, bucket "
        "tables, dropped-id sets) — multi-pass operators put the heavy "
        "joins there.  All plans ran to completion, so counts are final "
        "adaptive form.",
        "",
        "| query | pipeline | shuffle exchanges | broadcast exchanges | "
        "broadcast joins | SMJ | parquet scans | cache reads | "
        "python stages | finalized |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
        *rows,
    ]


def streaming_state_section(
    stream_caps: list[tuple[str, str, list[dict]]]
) -> list[str]:
    """Audit rows for the streaming queries' STATEFUL operators, from the
    StreamingQueryProgress the gate run itself emitted (VERDICT r6 item 3:
    the main-table rows for streaming queries describe only the memory-sink
    read; these rows are the streaming DAG's real state metrics)."""
    rows = []
    for qname, sink, progress in stream_caps:
        for p in progress:
            for op in p.get("stateOperators", []):
                rows.append(
                    f"| {qname} | {p.get('batchId')} | "
                    f"{p.get('numInputRows', 0)} | "
                    f"{op.get('operatorName', '?')} | "
                    f"{op.get('numRowsTotal', 0)} | "
                    f"{op.get('numRowsUpdated', 0)} | "
                    f"{op.get('numRowsDroppedByWatermark', 0)} | "
                    f"{op.get('memoryUsedBytes', 0) / 2**20:.2f} | "
                    f"{op.get('numShufflePartitions', 0)} |"
                )
    return [
        "",
        "## Streaming state operators",
        "",
        "Per-microbatch `StreamingQueryProgress.stateOperators` metrics "
        "captured from the SAME Structured Streaming executions audited "
        "above (via `streaming.events.STREAMING_OBSERVER`) — the streaming "
        "DAG's stateful operators, which no batch explain can show.  "
        "AvailableNow appends a data-less watermark-finalize batch after "
        "the data batch; its row is the state left after late-data "
        "eviction.  Late-drop behavior itself is pinned in "
        "tests/test_streaming.py (numRowsDroppedByWatermark == 1 on a "
        "day-late replay) under BOTH state-store providers.",
        "",
        "| query | batch | input rows | state operator | state rows | "
        "rows updated | dropped by watermark | state MiB | "
        "shuffle partitions |",
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
        "executed run — AQE runtime re-planning included).  Rows marked "
        "† answer from a cached materialized result "
        "(materialize_release): every main-table column for them — scans, "
        "exchanges, shuffle MiB — describes the terminal CACHE-READ job "
        "only, so zeros there do NOT mean the query is scan- or "
        "shuffle-free; the pipeline that actually did the work (its real "
        "scans, exchanges and joins) is audited in the matching "
        "'Materialization pipelines' rows below.  The two "
        "events_streaming rows similarly report the memory-SINK read of "
        "an already-executed Structured Streaming job — the streaming "
        "DAG itself is not a batch plan; its stateful operators are "
        "audited from the run's own StreamingQueryProgress in the "
        "'Streaming state operators' section below.  Likewise "
        "pack_assembly_incremental and dedup_retraction do their real "
        "work EAGERLY inside the builder (a streaming ingest / two "
        "process_batch runs plus four staging-swap store rewrites) and "
        "their rows describe only the terminal parquet read of the "
        "emitted output; their executed shape is audited elsewhere — "
        "streaming state here, per-phase wall decomposition and "
        "store-size scaling in EXPERIMENTS §20-§22.",
        "",
        "| query | scans | cols read | pushed filters | exchanges | broadcast | SMJ | codegen spans | python stages | top-k | scan MiB | shuffle MiB | rows |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    import bigdatastructure_a5_spark.session as _session
    import bigdatastructure_a5_spark.streaming.events as _stream_events

    mat_rows: list[str] = []
    stream_caps: list[tuple[str, str, list[dict]]] = []
    for name, qd in sorted(REGISTRY.items()):
        captures: list[tuple[str, dict | None]] = []
        _session.MATERIALIZATION_OBSERVER = lambda df, c=captures: c.extend(
            _materialization_audits(df)
        )
        _stream_events.STREAMING_OBSERVER = (
            lambda sink, progress, n=name: stream_caps.append(
                (n, sink, progress)
            )
        )
        try:
            df = qd.builder(spark, sf_dir)
        finally:
            _session.MATERIALIZATION_OBSERVER = None
            _stream_events.STREAMING_OBSERVER = None
        for label, t in captures:
            if t is None:
                mat_rows.append(
                    f"| {name} | {label} | - | - | - | - | - | - | - | - |"
                )
                continue
            mat_rows.append(
                f"| {name} | {label} | {t['exchanges']} | {t['bcast_ex']} | "
                f"{t['bhj']} | {t['smj']} | {t['scans']} | "
                f"{t['cache_reads']} | {t['python']} | "
                f"{'yes' if t['finalized'] else 'NO'} |"
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
        # the † cross-reference: this row reads a cached result; its real
        # work is in the materialization rows (header explains the marker)
        name = f"{name} †" if captures else name
        lines.append(
            f"| {name} | {a['scans']} | {a['read_cols']} | {a['pushed_filters']} | "
            f"{a['exchanges']} | {a['broadcasts']} | {a['smj']} | {a['codegen']} | "
            f"{a['python']} | {'yes' if a['topk'] else ''} | "
            f"{qm.scanned_bytes / 2**20:.2f} | {qm.shuffle_bytes / 2**20:.3f} | "
            f"{int(qm.output_rows)} |"
        )
    if mat_rows:
        lines.extend(materialization_section(mat_rows))
    if stream_caps:
        lines.extend(streaming_state_section(stream_caps))
    lines.extend(bucketed_layout_section(spark, sf_dir))
    out = Path(__file__).resolve().parent.parent / "PLAN_AUDIT.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

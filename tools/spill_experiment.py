"""Constrained-memory proof: the heavy operators SPILL, they don't OOM.

VERDICT r6 item 4: every scaling measurement so far ran in a 128 GiB box
that never pressures memory, so "would survive a 100x scale-up" rested on
plan shape alone.  This tool runs the two heaviest registry queries
(dedup_minhash_lsh, pipeline_curation) at xN scale inside DELIBERATELY
SMALL fresh JVMs (2-4 g heap — a fraction of the working set per core
that a production executor would see) and records:

- wall-clock vs the unconstrained (8 g default) run,
- the SQL metrics store's per-node "spill size" totals (sort /
  aggregate / join spill — the graceful path),
- completion status (an OOM would kill the child, and be reported).

Each measurement is a SUBPROCESS because driver heap is fixed at JVM
launch; the child re-enters this file with --child and prints one JSON
line.  Owns the "## 11." section of EXPERIMENTS.md (same splice protocol
as bench_variance / skew_experiment).

Usage: python tools/spill_experiment.py [copies]       (default x30)
       python tools/spill_experiment.py --child <query> <sf_dir> <mem> <cpus> [fraction] [persist_level]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SECTION = "## 11. Constrained memory: spill, not OOM, measured"

QUERIES = ("dedup_minhash_lsh", "pipeline_curation")

#: (label, heap, cpus, extra-conf dict or None, persist level or None).
#: The 2 g / 16-core case gives each task ~45 MiB of execution+storage
#: memory — far below the working set per task at x100; fraction=0.2
#: squeezes the unified region further, the regime where Spark MUST spill
#: to finish.  The partitions=256 case is the deploy-checklist fix for
#: the one case that DOES die at 2 g (curation's uncapped-jaccard hash
#: aggregate): 16 shuffle partitions at this scale put so much data per
#: task that the aggregate accumulates thousands of spill files whose
#: READER buffers alone exceed heap at merge time — re-sizing the initial
#: partition count (the checklist's first row: the one direction AQE
#: cannot repair) shrinks per-task state back under memory.  DISK_ONLY
#: is the persist-level mitigation (session.persist_df) for
#: cache-fill-on-heap pressure.  The unconstrained row is the baseline
#: the slowdown is read against.
CASES = (
    ("unconstrained (8g)", "8g", 32, None, None),
    ("2g heap, 16 cores", "2g", 16, None, None),
    (
        "2g heap, 16 cores, memory.fraction=0.2",
        "2g",
        16,
        {"spark.memory.fraction": "0.2"},
        None,
    ),
    (
        "2g heap, 16 cores, DISK_ONLY intermediates",
        "2g",
        16,
        None,
        "DISK_ONLY",
    ),
    (
        "2g heap, 16 cores, shuffle.partitions=256",
        "2g",
        16,
        {"spark.sql.shuffle.partitions": "256"},
        None,
    ),
)


def _session_spill_bytes(spark) -> float:
    """Sum every 'spill size' SQL metric across ALL executions of the
    session — the heavy queries run their real work inside
    materialize_release pipelines (separate SQL executions from the
    terminal cache-read job), so per-query metrics would miss exactly the
    stages that spill."""
    import time

    from bigdatastructure_a5_spark.plans.metrics import _parse_metric

    time.sleep(2.0)  # status-store listener bus is async; let it drain
    store = spark._jsparkSession.sharedState().statusStore()
    total = 0.0
    lst = store.executionsList()
    for i in range(lst.size()):
        eid = lst.apply(i).executionId()
        values = store.executionMetrics(eid)
        nodes = store.planGraph(eid).allNodes().iterator()
        while nodes.hasNext():
            n = nodes.next()
            ms = n.metrics().iterator()
            while ms.hasNext():
                m = ms.next()
                if "spill" in m.name().lower() and values.contains(
                    m.accumulatorId()
                ):
                    total += _parse_metric(values.apply(m.accumulatorId()))
    return total


def child(
    query: str,
    sf_dir: str,
    mem: str,
    cpus: str,
    extra_json: str | None,
    persist_level: str | None = None,
) -> None:
    import time

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    if persist_level:
        os.environ["SPARK_GRAFT_PERSIST_LEVEL"] = persist_level
    from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
    from bigdatastructure_a5_spark.session import get_spark

    _load_all()
    extra = json.loads(extra_json) if extra_json else None
    spark = get_spark(f"spill-{query}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # time the WHOLE flow: for materialized queries the heavy joins run
    # inside builder() (cache fill), and the terminal job only reads it
    t0 = time.perf_counter()
    df = REGISTRY[query].builder(spark, sf_dir)
    rows = df.count()
    wall = time.perf_counter() - t0
    print(
        "SPILL_RESULT "
        + json.dumps(
            {
                "wall": wall,
                "spill_bytes": _session_spill_bytes(spark),
                "rows": rows,
            }
        )
    )


def run_case(
    query: str, sf_dir: str, mem: str, cpus: int, extra, persist_level=None
) -> dict:
    """One fresh-JVM measurement; a failed attempt is retried ONCE and the
    retry is named in the status (a heap this tight sits near the JVM's
    edge — a transient launch-time failure is box noise, a repeatable one
    is the OOM the experiment exists to rule out).  Failure tails land in
    /tmp/bds_spill_fail_*.log for diagnosis."""
    cmd = [
        sys.executable,
        __file__,
        "--child",
        query,
        sf_dir,
        mem,
        str(cpus),
    ]
    if extra or persist_level:
        cmd.append(json.dumps(extra) if extra else "")
    if persist_level:
        cmd.append(persist_level)
    last_status = "?"
    saw_oom = False
    for attempt in (1, 2):
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
                cwd=str(REPO),
            )
        except subprocess.TimeoutExpired:
            # a hung constrained-heap child is exactly the pathology this
            # experiment probes — record it through the same retry/row path
            # instead of aborting the whole run and losing measured rows
            # (subprocess.run already killed the child before raising)
            last_status = "TIMEOUT (3600s)"
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("SPILL_RESULT "):
                out = json.loads(line[len("SPILL_RESULT "):])
                out["status"] = (
                    "completed" if attempt == 1 else "completed (1 retry)"
                )
                return out
        tail = (proc.stderr or proc.stdout)[-4000:]
        tag = "_".join(
            f"{k.rsplit('.', 1)[-1]}{v}" for k, v in (extra or {}).items()
        ) or "def"
        flog = Path(
            "/tmp/bds_spill_fail_"
            f"{query}_{mem}_{tag}_{persist_level or 'heap'}_{attempt}.log"
        )
        flog.write_text(tail)
        # an executor-thread OOM often surfaces as SECONDARY failures on
        # the next attempt's tail (missing spill files, dead block
        # manager) — classify on ANY attempt's tail, not just the last
        saw_oom = saw_oom or "OutOfMemoryError" in tail
        last_status = (
            "OOM" if saw_oom else f"FAILED rc={proc.returncode} (see {flog})"
        )
    return {
        "wall": float("nan"),
        "spill_bytes": 0.0,
        "rows": -1,
        "status": f"{last_status} x2",
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(
            sys.argv[2],
            sys.argv[3],
            sys.argv[4],
            sys.argv[5],
            sys.argv[6] or None if len(sys.argv) > 6 else None,
            sys.argv[7] if len(sys.argv) > 7 else None,
        )
        return

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    from scale_fixtures import ensure_x10

    sf_dir = ensure_x10("/root/testdata/sf0.01", copies=copies)
    rows = []
    base_rows = {}
    for query in QUERIES:
        for label, mem, cpus, extra, persist_level in CASES:
            r = run_case(query, sf_dir, mem, cpus, extra, persist_level)
            if label.startswith("unconstrained"):
                base_rows[query] = r
            base = base_rows.get(query, r)
            same_rows = (
                "=" if r["rows"] == base["rows"] else f"DIFFERS({r['rows']})"
            )
            slowdown = (
                r["wall"] / base["wall"] if base["wall"] else float("nan")
            )
            rows.append(
                f"| {query} | {label} | {r['status']} | {r['wall']:.1f} | "
                f"{slowdown:.2f}x | {r['spill_bytes'] / 2**20:.0f} | "
                f"{same_rows} |"
            )
            print(rows[-1])

    section = "\n".join(
        [
            SECTION,
            "",
            f"`tools/spill_experiment.py {copies}`: the two heaviest registry",
            f"queries at x{copies} of sf0.01 ({copies * 500:,} documents), each in a",
            "FRESH JVM sized per the case column (driver heap == the whole",
            "local-mode executor).  'spill MiB' sums the SQL metrics",
            "store's per-node spill size across ALL of the session's",
            "executions (the heavy joins run in materialization",
            "pipelines); 'rows' checks the constrained answer is",
            "identical.  The claim under test: when per-task memory drops",
            "far below the working set, the operators degrade to disk",
            "spill and finish — they do not OOM — because every heavy",
            "stage is a standard shuffle consumer (sort-merge join,",
            "hash aggregate with fallback, external sort), never a",
            "collect or an unbounded in-memory structure.  The claim",
            "holds with ONE measured boundary: curation's uncapped",
            "hash aggregate at 16 shuffle partitions accumulates so many",
            "spill FILES per task that the merge-time reader buffers",
            "(1 MiB ReadAheadInputStream each) themselves exceed a 2 g",
            "heap — OOM in the spill path, not the data path.  The fix",
            "is the deploy checklist's FIRST row, partition count:",
            "shuffle.partitions=256 shrinks per-task state 16x and the",
            "same query completes in the same heap (spilling ~10 GiB),",
            "which is why under-sizing the initial partition count is",
            "called out as the one direction AQE cannot repair.",
            "",
            "| query | session | status | secs | vs unconstrained | "
            "spill MiB | rows |",
            "| --- | --- | --- | --- | --- | --- | --- |",
            *rows,
            "",
            "Deploy-checklist consequence (COVERAGE.md): size executor",
            "memory so a task's share (heap x memory.fraction / cores)",
            "covers the advisory partition size (256 MiB) with headroom,",
            "and size the INITIAL shuffle-partition count so per-task",
            "state stays bounded — under-sizing memory costs the slowdown",
            "measured here; under-sizing partitions is the one",
            "configuration that can turn graceful spill into an OOM.",
            "SPARK_GRAFT_PERSIST_LEVEL=DISK_ONLY (session.persist_df)",
            "additionally moves the multi-pass intermediates' caches off",
            "heap entirely.",
        ]
    )
    path = REPO / "EXPERIMENTS.md"
    text = path.read_text()
    tail = ""
    if SECTION in text:
        head, rest = text.split(SECTION, 1)
        head = head.rstrip() + "\n"
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt:].lstrip("\n")
    else:
        head = text.rstrip() + "\n"
    path.write_text(head + "\n" + section + "\n" + (("\n" + tail) if tail else ""))
    print(f"updated {path}")


if __name__ == "__main__":
    main()

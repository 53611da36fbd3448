"""Core-count scaling at x10 data: the committed answer to
`suspect_cpus_ignored` (VERDICT r14 item 2).

The driver's own 8-vs-32-core probe runs at sf0.1, where most rows are
fixed-overhead-dominated (planning, session, tiny shuffles) and the
ratios read ~1 regardless of the harness honoring `$SPARK_GRAFT_CPUS` —
which it does (session.py reads the env into `master(local[n])` and
`shuffle.partitions`), but the artifact couldn't prove it.  This tool
produces the measurement at a scale where parallel sections dominate:

1. build (or adopt) the x10 replication of sf0.1 via
   tools/scale_fixtures.ensure_x10 — ~6M lineitem rows;
2. run the UNMODIFIED `python bench.py` as a subprocess at
   `SPARK_GRAFT_CPUS=8` and `=32` against it (fresh process each, so the
   env genuinely drives the master string — the artifacts record
   `cpus`/`master`/`default_parallelism` since r15);
3. write both artifacts + the per-query 8c/32c ratio table to
   EXPERIMENTS_scaling_x10.json and splice a summary section into
   EXPERIMENTS.md.

Pair-emitting dedup rows are excluded from the headline geomean: the x10
fixture replicates documents as EXACT duplicates, so their required
output grows ~copies² and their wall measures output size, not
parallelism (same caveat as tools/scaling_sweep.py).

Usage: python tools/scaling_cpus.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent.parent
SECTION = "## 23. Core-count scaling at x10 data"

#: rows whose x10 output is quadratic in the copy count (exact-duplicate
#: replication) — kept in the table, excluded from the headline geomean
OUTPUT_BOUND = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_simhash",
    "dedup_retraction",
    "dedup_semantic",
    "pipeline_curation",
    "decontam_benchmark",
}


def run_pass(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from scale_fixtures import ensure_x10

    x10 = ensure_x10(base)
    print(f"x10 fixture: {x10}")
    doc32 = run_pass(x10, 32)
    print(f"32c total {doc32['value']}s steal {doc32.get('steal_pct_of_busy')}")
    doc8 = run_pass(x10, 8)
    print(f"8c total {doc8['value']}s steal {doc8.get('steal_pct_of_busy')}")

    q32, q8 = doc32["queries"], doc8["queries"]
    ratios = {q: round(q8[q] / q32[q], 2) for q in sorted(q32) if q in q8}
    parallel_ratios = [
        r for q, r in ratios.items() if q not in OUTPUT_BOUND
    ]
    geomean = round(
        math.exp(statistics.fmean(math.log(r) for r in parallel_ratios)), 2
    )
    out = {
        "base": base,
        "x10_dir": x10,
        "pass_32c": doc32,
        "pass_8c": doc8,
        "ratio_8c_over_32c": ratios,
        "geomean_ratio_non_output_bound": geomean,
        "output_bound_excluded": sorted(OUTPUT_BOUND),
    }
    jpath = REPO / "EXPERIMENTS_scaling_x10.json"
    jpath.write_text(json.dumps(out, indent=1))
    print(f"wrote {jpath}; geomean 8c/32c ratio (parallel rows) = {geomean}")

    lines = [
        SECTION,
        "",
        "`tools/scaling_cpus.py`: the UNMODIFIED `bench.py` run as a fresh"
        " subprocess at `SPARK_GRAFT_CPUS=8` and `=32` against the x10"
        " replication of sf0.1 (~6M lineitem rows — big enough that"
        " parallel sections dominate the fixed overhead that makes the"
        " sf0.1 probe read ~1 at any core count).  Both artifacts record"
        " `cpus`/`master`/`default_parallelism`, so the core-count"
        " contract is self-proving.  Raw passes + per-query ratios:"
        " EXPERIMENTS_scaling_x10.json.",
        "",
        f"- 32-core total: **{doc32['value']}s** (steal"
        f" {doc32.get('steal_pct_of_busy')}%, master `{doc32.get('master')}`,"
        f" defaultParallelism {doc32.get('default_parallelism')})",
        f"- 8-core total: **{doc8['value']}s** (steal"
        f" {doc8.get('steal_pct_of_busy')}%, master `{doc8.get('master')}`,"
        f" defaultParallelism {doc8.get('default_parallelism')})",
        f"- geomean 8c/32c wall ratio over the non-output-bound rows:"
        f" **{geomean}x** (output-quadratic dedup/curation rows excluded —"
        " their x10 answer grows ~copies², so wall measures output, not"
        " parallelism)",
        "",
        "| query | 32c s | 8c s | 8c/32c |",
        "| --- | --- | --- | --- |",
    ]
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        tag = " (output-bound)" if q in OUTPUT_BOUND else ""
        lines.append(f"| {q}{tag} | {q32[q]:.2f} | {q8[q]:.2f} | {r} |")
    lines.append("")
    section = "\n".join(lines)

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
    path.write_text(
        head + "\n" + section + "\n" + (("\n" + tail) if tail else "")
    )
    print(f"updated {path}")


if __name__ == "__main__":
    main()

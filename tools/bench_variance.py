"""Bench variance: repeat the DRIVER'S OWN bench protocol N times and
record the spread of its per-query min-of-2 values.

The driver's bench (bench.py) reports min-of-2 wall-clock per query from a
FRESH process/session; on a shared box that min still wobbles run-to-run
(observed ±20% on identical code).  This tool quantifies that wobble so a
reviewer can tell noise from a regression.

Protocol (recalibrated r15, VERDICT r14 item 7): each envelope sample IS a
bench.py observation.  The old envelope ran 10 consecutive reps of each
query inside one long-lived session, which amortizes the first-rep
plan-analysis/codegen cost that a real bench pays — its PIs under-covered
fresh-session min-of-2 behavior for big-plan rows (the r14
pipeline_curation false flag: PI ≤2.60 vs honest fresh-session 3.03).  Now
the tool launches N SUBPROCESS runs of bench.py itself (fresh Python +
JVM + session, min-of-2 with per-query steal retries, identical cooldown
gates) and the per-query samples are the N min-of-2 values — the
statistic read_bench.py verdicts a BENCH_r{N}.json against is then drawn
from the exact distribution that produced it, JIT warmup and all.

Pass-level steal resampling: a pass whose whole-run steal share exceeds
``SPARK_GRAFT_BENCH_STEAL_MAX`` (same threshold bench.py uses) measured
the neighbor, not the code — it is discarded and re-run, bounded by
``SPARK_GRAFT_ENVELOPE_STEAL_RETRY_SEC`` of extra wall (default 900; the
name is deliberately distinct from bench.py's per-query
``SPARK_GRAFT_BENCH_STEAL_RETRY_SEC`` — ADVICE r14 low).  If the budget
runs out during a persistent storm the contaminated passes are KEPT and
the JSON's ``pass_steal_pct`` / ``passes_discarded`` document it.

Usage: python tools/bench_variance.py [sf_dir] [passes]   (default: 7)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECTION = "## 8. Bench variance"

REPO = Path(__file__).resolve().parent.parent

#: Two-sided 97.5% Student-t quantiles, df 1..30 (abramowitz-stegun values);
#: beyond 30 the normal 1.96 is within 2%.
_T975 = {
    1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
    6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228,
    11: 2.201, 12: 2.179, 13: 2.160, 14: 2.145, 15: 2.131,
    16: 2.120, 17: 2.110, 18: 2.101, 19: 2.093, 20: 2.086,
    21: 2.080, 22: 2.074, 23: 2.069, 24: 2.064, 25: 2.060,
    26: 2.056, 27: 2.052, 28: 2.048, 29: 2.045, 30: 2.042,
}


def prediction_interval(ts: list[float]) -> tuple[float, float]:
    """95% prediction interval for ONE future observation:
    mean ± t(n-1, .975) · sd · sqrt(1 + 1/n)."""
    n = len(ts)
    if n < 2:
        v = ts[0] if ts else 0.0
        return v, v
    mean, sd = statistics.fmean(ts), statistics.stdev(ts)
    t = _T975.get(n - 1, 1.96)
    half = t * sd * (1 + 1 / n) ** 0.5
    return max(0.0, mean - half), mean + half


def _run_bench_pass(sf_dir: str) -> dict:
    """One fresh-process bench.py run; returns its parsed JSON line."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py's contract: exactly one JSON line on stdout
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def measure(
    sf_dir: str, passes: int
) -> tuple[dict[str, list[float]], list[dict], int]:
    """-> (samples per query, kept pass metadata, discarded passes)."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "5.0"))
    retry_budget = float(
        os.environ.get("SPARK_GRAFT_ENVELOPE_STEAL_RETRY_SEC", "900")
    )
    samples: dict[str, list[float]] = {}
    kept_meta: list[dict] = []
    discarded = 0
    retry_spent = 0.0
    while len(kept_meta) < passes:
        doc = _run_bench_pass(sf_dir)
        steal = doc.get("steal_pct_of_busy")
        wall = sum(doc["queries"].values())
        if (
            steal is not None
            and steal > threshold
            and retry_spent < retry_budget
        ):
            # this pass measured the hypervisor neighbor, not the code
            discarded += 1
            retry_spent += wall
            continue
        kept_meta.append(
            {
                "total": round(wall, 3),
                "steal_pct_of_busy": steal,
                "queries_steal": doc.get("queries_steal"),
                "loadavg": doc.get("loadavg"),
            }
        )
        for q, v in doc["queries"].items():
            samples.setdefault(q, []).append(v)
    return samples, kept_meta, discarded


def render(times: dict[str, list[float]], sf_dir: str, passes: int) -> str:
    lines = [
        SECTION,
        "",
        f"`tools/bench_variance.py {sf_dir} {passes}`: the driver's OWN "
        f"bench protocol run {passes}x, each pass a fresh-process "
        "`python bench.py` (new JVM/session, min-of-2 per query with "
        "per-query steal retries, load + steal cooldown gates) — so each "
        "sample below is drawn from exactly the distribution a "
        "BENCH_r{N}.json observation comes from, first-rep plan "
        "analysis/codegen included (VERDICT r14 item 7: the old "
        "single-session 10-rep envelope amortized JIT warmup and "
        "under-covered fresh-session behavior for big-plan rows).  "
        "Read a new value against the **PI95** column — a 95% prediction "
        "interval for one future observation, mean ± t(n-1, .975) · sd · "
        "sqrt(1 + 1/n): inside it is box noise, not a code regression.  "
        "`tools/read_bench.py BENCH_r{N}.json` mechanizes the verdict: "
        "it estimates the uniform session shift (whole-run level moves "
        "of ~10-30% where every query moves together), rescales, and "
        "verdicts against PI95 (the **share** column is the "
        "shift-invariant statistic).  Passes whose whole-run steal "
        "exceeded the contamination threshold were discarded and re-run "
        "(bounded — see the module docstring); per-pass steal is in the "
        "JSON.  Cross-ROUND totals are only comparable on shared slots "
        "(the registry rotates; r13 re-pinned it at 50 rows).",
        "",
        "| query | min s | median s | max s | stddev s | PI95 s | share |",
        "| --- | --- | --- | --- | --- | --- | --- |",
    ]
    total_min = total_med = 0.0
    for _, ts in times.items():
        total_min += min(ts)
        total_med += statistics.median(ts)
    for name, ts in sorted(times.items()):
        mn, md, mx = min(ts), statistics.median(ts), max(ts)
        sd = statistics.stdev(ts) if len(ts) > 1 else 0.0
        lo, hi = prediction_interval(ts)
        lines.append(
            f"| {name} | {mn:.3f} | {md:.3f} | {mx:.3f} | {sd:.3f} | "
            f"{lo:.3f}–{hi:.3f} | {md / total_med:.3%} |"
        )
    lines += [
        f"| **total** | **{total_min:.2f}** | **{total_med:.2f}** |  |  |  |  |",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    times, kept_meta, discarded = measure(sf_dir, passes)
    # raw samples for tools/read_bench.py — the markdown table is for
    # humans, the JSON is the machine-readable envelope
    jpath = REPO / "EXPERIMENTS_bench_variance.json"
    jpath.write_text(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "protocol": "fresh_process_bench_min_of_2",
                "passes": passes,
                "samples": times,
                # whole-run steal per KEPT pass (order matches samples)
                "pass_steal_pct": [
                    m["steal_pct_of_busy"] for m in kept_meta
                ],
                "pass_totals": [m["total"] for m in kept_meta],
                "pass_loadavg": [m["loadavg"] for m in kept_meta],
                # contaminated passes discarded and re-run (bounded; a
                # high pass_steal_pct entry means the budget ran out
                # during a persistent storm)
                "passes_discarded": discarded,
            },
            indent=1,
        )
    )
    section = render(times, sf_dir, passes)
    path = REPO / "EXPERIMENTS.md"
    text = path.read_text()
    tail = ""
    if SECTION in text:
        head, rest = text.split(SECTION, 1)
        head = head.rstrip() + "\n"
        # preserve any section ADDED AFTER this one — dropping the whole
        # remainder would silently delete a future '## 9.' on every run
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

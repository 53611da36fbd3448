"""Bench variance: repeat every registry query N times and record spread.

The driver's bench (bench.py) reports min-of-2 wall-clock per query; on a
shared box that min still wobbles run-to-run (observed ±20% on identical
code).  This tool quantifies that wobble so a reviewer can tell noise from
a regression: R reps per query (cache cleared before each), reporting min,
median, max, the sample standard deviation, a proper 95% prediction
interval for a single future observation (mean ± t(n-1, 0.975) · sd ·
sqrt(1 + 1/n) — ADVICE r6 flagged the old median ± 1.96 sd band as
understating at n=10), and each query's share of the total median (the
shift-invariant statistic tools/read_bench.py uses), then rewrites the
"Bench variance" section of EXPERIMENTS.md and drops the raw samples next
to it as EXPERIMENTS_bench_variance.json for machine consumption.

Usage: python tools/bench_variance.py [sf_dir] [reps]   (default reps: 10)
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark

SECTION = "## 8. Bench variance"

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


def measure(
    sf_dir: str, reps: int
) -> tuple[
    dict[str, list[float]], dict[str, float | None], dict[str, int]
]:
    import os

    from bench import _cpu_stat, _needs_steal_retry, _steal_pct

    _load_all()
    spark = get_spark("bench-variance")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(sf_dir + "/region.parquet").count()  # JVM warmup
    out: dict[str, list[float]] = {}
    # hypervisor steal per query BLOCK (the reps are contiguous, so a
    # noisy-neighbor burst contaminates one block — r14's first envelope
    # run had two blocks read 2-3x their steady state and the samples
    # alone can't say why; the steal share can)
    steal: dict[str, float | None] = {}
    # Steal-aware resampling (r14): a sample taken while the hypervisor
    # stole > threshold of our busy cycles measures the NEIGHBOR, not
    # the code, and one such rep inflates the PI enough to hide a real
    # regression (both r14 envelope attempts caught blocks at 46-57%
    # steal).  Each rep measures its own window; contaminated samples
    # are DISCARDED and re-run — bounded per query (at most `reps`
    # extra) and by a global wall budget so a permanent storm still
    # terminates, in which case the contaminated samples are kept (the
    # per-block steal share and the discard counts document it).
    discarded: dict[str, int] = {}
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "5.0"))
    retry_budget = float(
        os.environ.get("SPARK_GRAFT_ENV_STEAL_RETRY_SEC", "600")
    )
    retry_spent = 0.0
    for name, qd in sorted(REGISTRY.items()):
        ts: list[float] = []
        n_extra = 0
        s0 = _cpu_stat()
        while len(ts) < reps:
            spark.catalog.clearCache()
            a = _cpu_stat()
            t0 = time.perf_counter()
            df = qd.builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            st = _steal_pct(a, _cpu_stat())
            # same pinned predicate as bench.py's per-query retries
            # (tests/test_tools.py::test_bench_steal_retry_policy)
            if _needs_steal_retry(
                st, n_extra, retry_spent, threshold, reps, retry_budget
            ):
                n_extra += 1
                retry_spent += dt
                continue
            ts.append(dt)
        out[name] = ts
        discarded[name] = n_extra
        steal[name] = _steal_pct(s0, _cpu_stat())
    return out, steal, discarded


def render(times: dict[str, list[float]], sf_dir: str, reps: int) -> str:
    lines = [
        SECTION,
        "",
        f"`tools/bench_variance.py {sf_dir} {reps}`: every registry query "
        f"run {reps}x in one session (cache cleared per rep, first rep "
        "carries fresh-plan analysis + codegen).  The driver's bench "
        "records min-of-2; the spread below is the yardstick for reading "
        "a BENCH_r{N} delta.  Read a new value against the **PI95** "
        "column — a 95% prediction interval for one future observation, "
        "mean ± t(n-1, .975) · sd · sqrt(1 + 1/n): inside it is box "
        "noise, not a code regression.  The observed max is also shown "
        "but is a thin-tailed statistic at these rep counts (r5: three "
        "sub-0.5s queries landed above a 6-rep max on pure noise).  One "
        "caveat: these reps share ONE session, while BENCH_r{N} runs in "
        "a fresh one — whole-run level shifts of ~10-30% (every query "
        "moving together) are session-level box noise; `tools/"
        "read_bench.py BENCH_r{N}.json` mechanizes the discounting: it "
        "estimates the uniform shift, rescales each observation by it, "
        "and verdicts against PI95 (the **share** column is the "
        "shift-invariant statistic it uses).  Cross-ROUND totals are "
        "only comparable on shared slots (the registry rotates; r13 "
        "re-pinned it at 50 rows), and two rows are STRUCTURALLY heavy "
        "by design: `pack_assembly_incremental` runs a real Structured "
        "Streaming ingest (two AvailableNow microbatches with parquet "
        "state stores and exactly-once per-batch output; ~5s steady "
        "state, but its early reps run 2-3x that — stream-machinery "
        "warm-up that amortizes across a session — so its sd and PI "
        "read wide), and `dedup_retraction` runs TWO incremental-dedup "
        "batches plus fused state-store rewrites — ~3.5s median after "
        "r14 made retraction shuffle-free, staged batch-1's ingested "
        "state, fused the two maintenance rewrites per store into one "
        "and overlapped the stores' swaps (down from ~9-10s / sd 4.8 "
        "in r13, which made the row unfalsifiable), priced here so its "
        "PI is honest.  Per-query "
        "PI verdicts are the honest comparison.  The envelope JSON also "
        "records hypervisor CPU steal per query block "
        "(steal_pct_of_busy_per_block): this box loses a fluctuating "
        "2-75% of busy cycles to the hypervisor, invisible to loadavg — "
        "a block whose samples read far above its usual envelope should "
        "be checked against its steal share before being read as a "
        "regression.  Since r14 each rep measures its own steal window "
        "and contaminated samples (> SPARK_GRAFT_BENCH_STEAL_MAX of "
        "busy) are discarded and re-run, bounded per query and by a "
        "global wall budget (steal_discarded_per_block records the "
        "discards; a block that still shows high steal exhausted its "
        "allowance during a persistent storm).",
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    times, steal, discarded = measure(sf_dir, reps)
    # raw samples for tools/read_bench.py — the markdown table is for
    # humans, the JSON is the machine-readable envelope
    jpath = (
        Path(__file__).resolve().parent.parent
        / "EXPERIMENTS_bench_variance.json"
    )
    jpath.write_text(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "samples": times,
                "steal_pct_of_busy_per_block": steal,
                # contaminated samples discarded and re-run per query
                # (bounded; see measure() — a block that still reads
                # high steal exhausted its retry allowance)
                "steal_discarded_per_block": discarded,
            },
            indent=1,
        )
    )
    section = render(times, sf_dir, reps)
    path = Path(__file__).resolve().parent.parent / "EXPERIMENTS.md"
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

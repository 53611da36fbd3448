"""Bench variance: repeat every registry query N times and record spread.

The driver's bench (bench.py) reports min-of-2 wall-clock per query; on a
shared box that min still wobbles run-to-run (observed ±20% on identical
code).  This tool quantifies that wobble so a reviewer can tell noise from
a regression: R reps per query (cache cleared before each), reporting min,
median, max, the sample standard deviation, and a 95% prediction interval
for a single future observation (median ± 1.96 sd — the band a fresh
BENCH_r{N} value should land in if nothing changed; r5 showed a 6-rep
observed-max is thin enough that pure noise lands "above max"), then
rewrites the "Bench variance" section of EXPERIMENTS.md.

Usage: python tools/bench_variance.py [sf_dir] [reps]   (default reps: 10)
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark

SECTION = "## 8. Bench variance"


def measure(sf_dir: str, reps: int) -> dict[str, list[float]]:
    _load_all()
    spark = get_spark("bench-variance")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(sf_dir + "/region.parquet").count()  # JVM warmup
    out: dict[str, list[float]] = {}
    for name, qd in sorted(REGISTRY.items()):
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qd.builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        out[name] = ts
    return out


def render(times: dict[str, list[float]], sf_dir: str, reps: int) -> str:
    lines = [
        SECTION,
        "",
        f"`tools/bench_variance.py {sf_dir} {reps}`: every registry query "
        f"run {reps}x in one session (cache cleared per rep, first rep "
        "carries fresh-plan analysis + codegen).  The driver's bench "
        "records min-of-2; the spread below is the yardstick for reading "
        "a BENCH_r{N} delta.  Read a new value against the **CI95**"
        " column — a 95% prediction interval for one future observation "
        "(median ± 1.96 sd): inside it is box noise, not a code "
        "regression.  The observed max is also shown but is a thin-tailed "
        "statistic at these rep counts (r5: three sub-0.5s queries landed "
        "above a 6-rep max on pure noise).  One caveat: these reps share "
        "ONE session, while BENCH_r{N} runs in a fresh one — whole-run "
        "level shifts of ~10% (every query moving together) are "
        "session-level box noise; read per-query deltas only after "
        "discounting the uniform shift (compare the query's share of the "
        "total, not just its absolute seconds).",
        "",
        "| query | min s | median s | max s | stddev s | CI95 s |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    total_min = total_med = 0.0
    for name, ts in sorted(times.items()):
        mn, md, mx = min(ts), statistics.median(ts), max(ts)
        sd = statistics.stdev(ts) if len(ts) > 1 else 0.0
        lo, hi = max(0.0, md - 1.96 * sd), md + 1.96 * sd
        total_min += mn
        total_med += md
        lines.append(
            f"| {name} | {mn:.3f} | {md:.3f} | {mx:.3f} | {sd:.3f} | "
            f"{lo:.3f}–{hi:.3f} |"
        )
    lines += [
        f"| **total** | **{total_min:.2f}** | **{total_med:.2f}** |  |  |  |",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    section = render(measure(sf_dir, reps), sf_dir, reps)
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

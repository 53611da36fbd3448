"""Whole-registry scaling sweep: every query at 1x / 10x / 100x / 1000x.

The scale experiments so far were targeted — §4 proves LSH candidate volume
stays flat to 1000x, §5 proves the curation capstone is sub-linear to 100x.
This tool answers the complementary whole-surface question: does ANY of the
50 registry queries scale badly?  It runs every query at four data scales —
the three driver fixture dirs (sf0.001 / sf0.01 / sf0.1, a 1x/10x/100x
ladder) plus a x10 replication of sf0.1 built by tools/scale_fixtures.py
(1000x) — and reports the marginal wall-clock ratio per 10x data step.

Reading the numbers honestly:
- At the small end, per-query FIXED cost (job scheduling, plan analysis,
  codegen — a few hundred ms on local[32]) dominates, so early-step ratios
  near 1.0 mean "overhead-bound", not "magically sublinear".
- The LAST step (sf0.1 -> x10, ~6M lineitem rows / 50k docs) is the most
  compute-dominated and therefore the real scaling signal.
- A last-step ratio <= ~12 over 10x data is linear-or-better (noise
  allowance included); anything above is flagged **super-linear** and needs
  an explanation or a fix — on a 1000-executor cluster at 100 TB that query
  would be the bottleneck.
- Exception: OUTPUT_QUADRATIC queries (pair-emitting dedup/curation).  The
  x10 point replicates documents as EXACT duplicates, so their required
  answer grows ~copies^2 and wall-clock linearity is unattainable by any
  correct implementation on that corpus; they render as "output-bound"
  with a pointer to the §4/§5 linear-truth measurements.

Usage: python tools/scaling_sweep.py [reps]   (min-of-reps per cell)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdatastructure_a5_spark.registry import REGISTRY, _load_all
from bigdatastructure_a5_spark.session import get_spark

SECTION = "## 9. Whole-registry scaling sweep"

#: (label, relative data scale) per sweep point; the x10 dir is built lazily.
BASE_SCALES = [
    ("sf0.001", 1),
    ("sf0.01", 10),
    ("sf0.1", 100),
]

SUPER_LINEAR = 12.0  # last-step ratio above this (10x data) gets flagged

#: Pair-emitting dedup/curation queries whose TRUE ANSWER grows ~copies^2
#: on the sweep's 1000x point: scale_fixtures replicates documents as
#: EXACT duplicates, so every doc sits in a copies-way dup group and the
#: correct pair set itself is quadratic in the copy count — wall-clock
#: linearity is the wrong yardstick for them on THIS corpus shape (an
#: operator cannot be linear in input when its required output is not).
#: Their linear-truth scaling is measured separately on corpora whose true
#: pair count grows linearly: EXPERIMENTS §4 (candidates/doc flat to 100x
#: for minhash-LSH and capped ngram) and §5 (curation end-to-end).
OUTPUT_QUADRATIC = {
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_semantic",
    "pipeline_curation",
    # xN copies multiply BOTH slices, so the true cross-slice match set is
    # copies^2 (lifted_oracles._lift_decontam states the arithmetic)
    "decontam_benchmark",
}


def sweep(reps: int) -> tuple[list[tuple[str, int, str]], dict[str, list[float]]]:
    from scale_fixtures import ensure_x10

    scales = [
        (label, rel, f"/root/testdata/{label}") for label, rel in BASE_SCALES
    ]
    scales.append(("x10(sf0.1)", 1000, ensure_x10("/root/testdata/sf0.1")))

    _load_all()
    spark = get_spark("scaling-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, list[float]] = {name: [] for name in REGISTRY}
    for label, _rel, sf_dir in scales:
        spark.read.parquet(sf_dir + "/region.parquet").count()  # warm FS/JVM
        for name, qd in sorted(REGISTRY.items()):
            best = float("inf")
            try:
                for _ in range(reps):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    df = qd.builder(spark, sf_dir)
                    df.write.mode("overwrite").format("noop").save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # one bad cell must not kill the sweep
                print(f"{label:>11} {name:<34} FAILED: {exc}", flush=True)
                best = float("nan")
            times[name].append(best)
            print(f"{label:>11} {name:<34} {best:7.3f}s", flush=True)
    return scales, times


def render(
    scales: list[tuple[str, int, str]],
    times: dict[str, list[float]],
    reps: int,
) -> str:
    labels = [s[0] for s in scales]
    lines = [
        SECTION,
        "",
        f"`tools/scaling_sweep.py {reps}`: every registry query at four data "
        "scales — the driver fixtures sf0.001/sf0.01/sf0.1 (1x/10x/100x) "
        "plus a x10 key-consistent replication of sf0.1 (1000x, built by "
        "tools/scale_fixtures.py; ~6M lineitem rows, 50k documents).  Cells "
        f"are min-of-{reps} wall-clock seconds (cache cleared per rep); "
        "`r` columns are the marginal ratio per 10x data step.  At the "
        "small end per-query fixed cost (~0.1-0.3s of scheduling + codegen) "
        "dominates, so early ratios near 1 mean overhead-bound; the LAST "
        "step is the compute-dominated scaling signal.  A last-step ratio "
        f"<= ~{SUPER_LINEAR:.0f} over 10x data is linear-or-better (noise "
        "allowance included); anything above is flagged — EXCEPT the "
        "pair-emitting dedup/curation queries, whose required OUTPUT is "
        "itself quadratic in the copy count on the x10 point's "
        "exact-duplicate construction (every doc becomes a 10-way dup "
        "group, so the true pair set grows ~100x for 10x data); those "
        "read 'output-bound' and their linear-truth scaling is measured "
        "on linearly-growing-truth corpora in sections 4-5.",
        "",
        "| query | " + " s | ".join(labels) + " s | r 1→10 | r 10→100 | "
        "r 100→1000 | verdict |",
        "| --- | " + " | ".join("---" for _ in labels) + " | --- | --- | "
        "--- | --- |",
    ]
    flagged: list[tuple[str, float]] = []
    for name, ts in sorted(times.items()):
        ratios = [
            (ts[i + 1] / ts[i]) if ts[i] > 0 else float("inf")
            for i in range(len(ts) - 1)
        ]
        last = ratios[-1]
        if any(t != t for t in ts):  # NaN cell: the query failed there
            verdict = "**FAILED**"
            flagged.append((name, None))
        elif last > SUPER_LINEAR and name in OUTPUT_QUADRATIC:
            # not a flag: the x10 point's exact-duplicate construction
            # makes the required OUTPUT quadratic in copies (see
            # OUTPUT_QUADRATIC); linear-truth scaling for these is
            # measured in §4/§5
            verdict = "output-bound (dup-stress fixture; linear on §4/§5 corpora)"
        elif last > SUPER_LINEAR:
            verdict = "**super-linear**"
            flagged.append((name, last))
        elif last <= 2.0:
            verdict = "overhead-bound / sub-linear"
        elif last <= 6.0:
            verdict = "sub-linear"
        else:
            verdict = "~linear"
        cells = " | ".join("FAIL" if t != t else f"{t:.2f}" for t in ts)
        rcells = " | ".join("—" if r != r else f"{r:.1f}x" for r in ratios)
        lines.append(f"| {name} | {cells} | {rcells} | {verdict} |")
    # NaN cells (failed runs) are excluded so one failure doesn't poison
    # the totals row into all-NaN
    totals = [
        sum(ts[i] for ts in times.values() if ts[i] == ts[i])
        for i in range(len(labels))
    ]
    lines.append(
        "| **total** | "
        + " | ".join(f"**{t:.1f}**" for t in totals)
        + " | "
        + " | ".join(
            f"{totals[i + 1] / totals[i]:.1f}x" for i in range(len(totals) - 1)
        )
        + " |  |"
    )
    lines.append("")
    if flagged:
        lines.append(
            "Flagged super-linear (last-step ratio > "
            f"{SUPER_LINEAR:.0f}x): "
            + ", ".join(
                f"`{n}` (FAILED)" if r is None else f"`{n}` ({r:.1f}x)"
                for n, r in flagged
            )
            + " — each needs a fix or a documented reason before the "
            "100 TB story holds."
        )
    else:
        lines.append(
            "No query is super-linear on its compute-dominated step: the "
            "whole 50-query surface is linear-or-better to 1000x the "
            "smallest fixture (output-bound rows excepted as above — "
            "their answers grow quadratically on this fixture by "
            "construction, and sections 4-5 measure them linear on "
            "linear-truth corpora)."
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scales, times = sweep(reps)
    section = render(scales, times, reps)
    path = Path(__file__).resolve().parent.parent / "EXPERIMENTS.md"
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

"""Mechanical BENCH_r{N}.json reader: shift-discounted per-query verdicts.

VERDICT r6 item 5: every round the judge (and builder) had to hand-derive
"is this row a regression or session noise?" by comparing each query's
share-of-total against the §8 envelope.  This tool does that arithmetic:

1. load the driver bench (min-of-2 per query) and the §8 raw samples
   (EXPERIMENTS_bench_variance.json, written by tools/bench_variance.py);
2. estimate the UNIFORM SESSION SHIFT as the median over queries of
   bench_value / envelope_median — fresh-session JVM/box effects move every
   query together (observed 1.0-1.3x between sessions), and the median
   ratio is robust to the few genuinely-moved queries we're hunting;
3. discount: value_adj = value / shift, then verdict against the 95%
   prediction interval (mean ± t(n-1,.975) · sd · sqrt(1+1/n)) of the
   envelope samples:
     - below the band          -> improved
     - inside                  -> inside-PI (noise)
     - above by <= GRACE       -> watch  (single observation, sub-second
                                  excess; re-check next round)
     - above by more           -> REGRESSION
   GRACE: 15% of the upper bound or 0.15 s, whichever is larger — a
   min-of-2 observation against a 10-rep band has fat single-sample tails.

Exit code: 0 if no REGRESSION rows, else 1.

Accepts both shapes of the bench artifact: the driver's envelope
(``{"n": .., "parsed": {"queries": {...}}}`` — what BENCH_r{N}.json files
actually contain) and bench.py's own flat line (``{"queries": {...}}``).

Usage: python tools/read_bench.py BENCH_r07.json [envelope.json]
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_variance import prediction_interval  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
DEFAULT_ENVELOPE = REPO / "EXPERIMENTS_bench_variance.json"


def read_bench(
    bench: dict[str, float], samples: dict[str, list[float]]
) -> tuple[float, list[tuple[str, float, float, float, float, str]]]:
    """-> (shift, rows); row = (name, raw, adj, pi_lo, pi_hi, verdict)."""
    common = sorted(set(bench) & set(samples))
    if not common:
        raise ValueError("bench and envelope share no query names")
    shift = statistics.median(
        bench[q] / statistics.median(samples[q]) for q in common
    )
    rows = []
    for q in common:
        raw = bench[q]
        adj = raw / shift
        lo, hi = prediction_interval(samples[q])
        grace = max(0.15 * hi, 0.15)
        if adj < lo:
            verdict = "improved"
        elif adj <= hi:
            verdict = "inside-PI"
        elif adj <= hi + grace:
            verdict = "watch"
        else:
            verdict = "REGRESSION"
        rows.append((q, raw, adj, lo, hi, verdict))
    return shift, rows


def unwrap_bench_doc(doc: dict) -> dict[str, float]:
    """Extract the per-query seconds map from either bench-artifact shape.

    The driver wraps bench.py's JSON line in an envelope under "parsed";
    bench.py itself prints the flat shape with "queries" at top level.
    """
    inner = doc.get("parsed", doc)
    try:
        return inner["queries"]
    except (TypeError, KeyError):
        raise ValueError(
            "bench doc has neither top-level 'queries' nor 'parsed.queries' "
            f"(keys: {sorted(doc) if isinstance(doc, dict) else type(doc)})"
        ) from None


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    doc = json.loads(Path(sys.argv[1]).read_text())
    bench_queries = unwrap_bench_doc(doc)
    env_path = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_ENVELOPE
    env = json.loads(env_path.read_text())
    shift, rows = read_bench(bench_queries, env["samples"])

    # r13: bench.py records os.getloadavg() at start and end so a
    # contaminated artifact (the r11/r12 failure mode: sweeps sharing the
    # box inflated totals ~20% and forged envelope "regressions") is
    # self-identifying.  A quiet 32-thread box starts well under 4.
    la = (doc.get("parsed", doc) or {}).get("loadavg")
    if la:
        # key on the START load only: the bench's own 32-thread run
        # legitimately inflates the END (and mid-run) load averages, so
        # gating on them would fire on every quiet box too (r13 review
        # finding).  A quiet box STARTS below ~2-3; >4 means something
        # else was already running when the bench began.
        if la.get("start", [0])[0] > 4.0:
            print(
                f"WARNING: bench STARTED on a BUSY box (loadavg start="
                f"{la.get('start')}, end={la.get('end')}) — timings and "
                "the verdicts below likely over-report; re-run on a "
                "quiet box before trusting any regression"
            )
    # r14: bench.py also records hypervisor CPU steal during the timed
    # section — contamination loadavg CANNOT see (it is external to the
    # VM; measured 2-18% of busy cycles minute-to-minute on this box,
    # enough to move parallel-stage walls 10-50% between runs that both
    # look idle from inside).
    # contamination threshold: the one the ARTIFACT was produced under
    # (bench.py records it since r15); 5.0 only as a legacy fallback for
    # pre-r15 artifacts that carry no threshold field (ADVICE r14 low)
    thr = (doc.get("parsed", doc) or {}).get("steal_threshold_pct", 5.0)
    steal = (doc.get("parsed", doc) or {}).get("steal_pct_of_busy")
    if steal is not None and steal > thr:
        print(
            f"WARNING: {steal}% of busy CPU cycles were STOLEN by the "
            "hypervisor during this bench — per-query deltas below are "
            "dominated by neighbor noise, not code; re-run and compare"
        )

    print(
        f"uniform session shift: {shift:.3f}x "
        f"(bench total {sum(bench_queries.values()):.2f}s vs envelope "
        f"median total "
        f"{sum(statistics.median(v) for v in env['samples'].values()):.2f}s)"
    )
    # r14: bench.py also records the winning rep's OWN steal window per
    # query (`queries_steal`) — a flagged row whose winner was itself
    # contaminated is host noise until re-measured, not a code verdict
    qsteal = (doc.get("parsed", doc) or {}).get("queries_steal") or {}
    print(f"{'query':34s} {'raw':>7s} {'adj':>7s} {'PI95':>15s}  verdict")
    flagged = 0
    for q, raw, adj, lo, hi, verdict in rows:
        if verdict != "inside-PI":
            s = qsteal.get(q)
            tag = (
                f"  [winner rep steal {s}% — contaminated row]"
                if isinstance(s, (int, float)) and s > thr
                else ""
            )
            print(
                f"{q:34s} {raw:7.3f} {adj:7.3f} "
                f"{lo:7.3f}–{hi:<7.3f} {verdict}{tag}"
            )
        if verdict == "REGRESSION":
            flagged += 1
    n_in = sum(1 for r in rows if r[5] == "inside-PI")
    print(f"\n{n_in}/{len(rows)} inside-PI after shift discount; "
          f"{flagged} regression(s)")
    missing = sorted(set(bench_queries) - set(env["samples"]))
    if missing:
        print(f"note: no envelope for {missing} (new queries?) — unverdicted")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())

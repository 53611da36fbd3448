"""Spark-free units for the measurement tools' pure logic.

The tools themselves are validated by the artifacts they regenerate
(EXPERIMENTS.md, PLAN_AUDIT.md); these tests pin the pure decision
logic — the scaling sweep's verdict/flagging rules — which otherwise
only runs inside a ~15-minute full sweep.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scaling_sweep import SUPER_LINEAR, render  # noqa: E402

SCALES = [
    ("sf0.001", 1, "/d/sf0.001"),
    ("sf0.01", 10, "/d/sf0.01"),
    ("sf0.1", 100, "/d/sf0.1"),
    ("x10(sf0.1)", 1000, "/tmp/x10"),
]


def _row(section: str, name: str) -> str:
    rows = [l for l in section.splitlines() if l.startswith(f"| {name} |")]
    assert len(rows) == 1, f"expected exactly one row for {name}"
    return rows[0]


def test_render_verdicts_and_flagging():
    times = {
        # last step 20x > SUPER_LINEAR: flagged
        "quadratic_q": [0.1, 0.2, 1.0, 20.0],
        # last step exactly linear (10x): '~linear', not flagged
        "linear_q": [0.1, 0.1, 0.5, 5.0],
        # flat at all scales: overhead-bound
        "flat_q": [0.2, 0.2, 0.2, 0.2],
        # failed at one rung: FAILED, flagged, must not raise
        "broken_q": [0.1, float("nan"), 0.2, 0.3],
    }
    section = render(SCALES, times, reps=2)

    assert "**super-linear**" in _row(section, "quadratic_q")
    assert "~linear" in _row(section, "linear_q")
    assert "overhead-bound" in _row(section, "flat_q")
    assert "**FAILED**" in _row(section, "broken_q")
    # the summary line names both problem queries
    assert "Flagged super-linear" in section
    assert "`quadratic_q` (20.0x)" in section
    assert "`broken_q` (FAILED)" in section
    assert "nan" not in section


def test_render_clean_sweep_has_no_flags():
    times = {"q": [0.1, 0.2, 0.5, 2.0]}
    section = render(SCALES, times, reps=3)
    assert "Flagged" not in section
    assert "No query is super-linear" in section
    # header carries the rep count actually used
    assert "min-of-3" in section
    # totals row present with all four scale columns
    assert _row(section, "**total**").count("|") >= 8


def test_super_linear_threshold_is_generous_vs_linear():
    # the threshold must not flag plain linear growth (10x) plus noise
    assert SUPER_LINEAR >= 12.0

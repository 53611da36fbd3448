"""Semantic dedup at scale -> EXPERIMENTS.md §19.

The xN embeddings construction circular-shifts every copy-c vector by c
positions — norm- and within-copy-dot-preserving, so each copy repeats
the base relations — and rotated copies of correlated vectors REMAIN
loosely correlated across copies, so at the 0.45 threshold the true
pair set itself grows ~N² (14 pairs at x1 -> 107,959 at x100; the
same answer-size growth §9 prices for the lexical pair family).  That is exactly the regime SemDeDup-style
within-cell scoring targets: sqrt(n) cells make the within-cell gram
matrices O(n^1.5) total.  This tool prices both paths at each rung and
measures what the cell restriction costs in recall on this corpus's
LOOSE (0.45-cosine) pairs — the adversarial case for cell co-location
(tight duplicates co-locate essentially always; see the planted-pair
pytest in test_dedup_similarity.py).

Usage: python tools/semdedup_scale.py [copies ...]   (default 1 10 30 100)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SECTION = "## 19. Semantic dedup at scale: within-cell vs exact all-pairs"
BASE = "/root/testdata/sf0.01"
THRESHOLD = 0.45


def measure(spark, copy_points) -> list[str]:
    from scale_fixtures import ensure_x10

    from bigdatastructure_a5_spark.operators.similarity import (
        auto_cells,
        cosine_pairs,
        cosine_pairs_in_cells,
        fit_centroids_sample,
        with_ivf_cells,
        with_ivf_cells_probed,
    )

    rows = []
    for copies in copy_points:
        sf_dir = BASE if copies == 1 else ensure_x10(BASE, copies)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()

        t0 = time.perf_counter()
        tracked: list = []
        exact = {
            (r.id_a, r.id_b)
            for r in cosine_pairs(
                emb, THRESHOLD, tracker=tracked
            ).collect()
        }
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_cells = auto_cells(n)
        cents = [
            (i, c.tolist())
            for i, c in enumerate(
                fit_centroids_sample(emb, n_centroids=n_cells)
            )
        ]
        # method='blas' explicitly: the 4-probe path uses BLAS tie rules,
        # and the SQL argmax (auto picks it at <= 32 cells) can flip an
        # assignment on a float-noise tie — the monotonicity assertion
        # below requires both paths to share tie behavior
        celled = with_ivf_cells(emb, cents, method="blas")
        within = {
            (r.id_a, r.id_b)
            for r in cosine_pairs_in_cells(
                celled, THRESHOLD, tracker=tracked
            ).collect()
        }
        t_cell = time.perf_counter() - t0

        t0 = time.perf_counter()
        probed = with_ivf_cells_probed(emb, cents, n_probe=4)
        within4 = {
            (r.id_a, r.id_b)
            for r in cosine_pairs_in_cells(
                probed, THRESHOLD, tracker=tracked
            ).collect()
        }
        t_probe = time.perf_counter() - t0
        for df in tracked:
            df.unpersist()

        assert within <= exact, "within-cell emitted a non-exact pair"
        assert within <= within4 <= exact, "probing must grow monotonically"
        recall = len(within) / len(exact) if exact else float("nan")
        recall4 = len(within4) / len(exact) if exact else float("nan")
        rows.append(
            f"| x{copies} | {n:,} | {len(exact):,} | {t_exact:.1f} | "
            f"{len(cents)} | {len(within):,} | {recall:.0%} | {t_cell:.1f} | "
            f"{len(within4):,} | {recall4:.0%} | {t_probe:.1f} |"
        )
        print(rows[-1])
    return rows


def main() -> None:
    from bigdatastructure_a5_spark.session import get_spark

    copy_points = (
        tuple(int(a) for a in sys.argv[1:])
        if len(sys.argv) > 1
        else (1, 10, 30, 100)
    )
    spark = get_spark("semdedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rows = measure(spark, copy_points)
    section = "\n".join(
        [
            SECTION,
            "",
            "`tools/semdedup_scale.py`: exact all-pairs cosine",
            "(`cosine_pairs`, block-tiled BLAS + exact refine) vs the",
            "SemDeDup-style within-cell path (`cosine_pairs_in_cells`",
            "over sqrt(n) auto-sized IVF cells, same exact refine) on",
            f"the xN embeddings at threshold {THRESHOLD}.  The xN",
            "construction circular-shifts each copy's vectors by the",
            "copy index — norm- and within-copy-dot-preserving — and",
            "rotated copies of correlated vectors stay loosely",
            "correlated, so at this threshold the TRUE pair set itself",
            "grows ~N² (14 -> 107,959 pairs at x100) while all-pairs",
            "work grows N² with it.  Recall here is",
            "the ADVERSARIAL read: these are loose 0.45-cosine",
            "relations, the pairs most likely to straddle a cell",
            "boundary (tight duplicates co-locate essentially always —",
            "the planted-pair pytest measures >= 90% at cosine ~0.9995).",
            "The 1-probe wall includes the shared centroid fit; the",
            "4-probe wall reuses it (the codebook is a write-time",
            "artifact, fitted once).  The 4-probe",
            "columns price the recall dial (with_ivf_cells_probed: each",
            "vector joins its 4 nearest cells, a pair is found in any",
            "shared cell — ~4x the scoring work).  Every emitted pair is",
            "verified a subset of the exact answer, and probing verified",
            "monotone, at every rung before timing is reported.",
            "Since r11 the operator also carries a DRIVER row",
            "(`dedup_semantic`: 8-seed codebook, rendered-SQL argmax",
            "assignment, within-cell pairs hash-matched against the",
            "same-cell-filtered all-pairs oracle at sf0.01 and x10).",
            "",
            "| corpus | vectors | exact pairs | exact secs | cells | "
            "1-probe pairs | recall | 1-probe secs | "
            "4-probe pairs | recall | 4-probe secs |",
            "| --- | --- | --- | --- | --- | --- | --- | --- | "
            "--- | --- | --- |",
            *rows,
            "",
            "Reading: the exact path's wall bends quadratically with the",
            "corpus while the within-cell path stays near-linear (cells",
            "grow as sqrt(n), so per-cell work is flat-ish); the recall",
            "column prices the trade on the hardest pairs.  The 100 TB",
            "recipe follows: run within-cell scoring as the default",
            "semantic-dedup pass with the probe count sized to the",
            "recall the curation policy needs, reserve exact tiling for",
            "bounded",
            "slices, and feed either pair set to cluster_dedup",
            "(EXPERIMENTS §18) for the one-representative-per-cluster",
            "keep set.",
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

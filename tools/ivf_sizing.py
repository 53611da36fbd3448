"""IVF codebook sizing: cells ~ sqrt(n) vs the old fixed 16, measured.

VERDICT r6 item 1: the SRP plane family got a measured corpus-tracking
rule (auto_planes, EXPERIMENTS §4) after the §4 table exposed 4-plane
saturation at x10; IVF had the same failure shape — a fixed 16-cell
codebook probes n/4 vectors per query at any corpus size (a
quarter-brute-force) — but no equivalent table.  This tool produces it:
for corpora at x1/x10/x100/x1000 of the sf0.1 embeddings (2k/20k/200k/2M
vectors, the §4 rotation construction), it measures

- fixed  n_centroids=16, n_probe=4        (the old default),
- auto   auto_cells(n) ~ sqrt(n), auto_probe(cells) ~ cells^0.5
  (ivf_topk's default since r7 when the parameters are omitted), and
- auto with DOUBLED probes — the recall dial at constant codebook,

on a Lloyd codebook (fit_centroids_sample, the production quantizer,
sample co-sized at 64 points/centroid).  The index BUILD (codebook fit +
cell assignment over the corpus, with_ivf_cells) is timed separately and
amortized: it is the write-time cost — at 100 TB the corpus is stored
partitioned by cell — so charging it to every query (as the pre-r7
version of this tool did) mismeasured the serving path by ~40x at the
447-cell point.  Per-query wall is probe-rank + cell filter + exact
scoring over a prebuilt celled corpus, the ivf_topk(celled=...) shape.
Owns the "## 12." section of EXPERIMENTS.md (same splice protocol as
bench_variance / skew_experiment).

Usage: python tools/ivf_sizing.py [copies ...]   (default: 1 10 100 1000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdatastructure_a5_spark.session import get_spark  # noqa: E402

SECTION = "## 12. IVF codebook sizing: cells ~ sqrt(n), measured"

TESTDATA = "/root/testdata/sf0.1"
N_QUERIES = 5


def scaled_embeddings(spark, copies: int):
    """x{copies} corpus by the §4 construction: disjoint id ranges, each
    copy's vector rotated by c positions (norm-preserving, spreads
    directions so cells stay meaningful).

    Built as ONE explode over a copy sequence with the rotation computed
    from the copy column (SQL slice takes expression args), not a
    copies-way unionAll — a 1000-branch union is an analysis-time problem
    before it is anything else, and this form stays a single plan node at
    any copy count."""
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if copies == 1:
        return emb
    dim = len(emb.first()["embedding"])
    # spread the SMALL base before the fan-out: the fixture is one parquet
    # split, and explode preserves partitioning — unrepartitioned, the
    # whole x1000 corpus (and every fold over it) would run as ONE task.
    # Shuffling 2k base rows costs nothing; each task then explodes its
    # own share of the copies.
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    return emb.select(
        F.explode(F.expr(f"sequence(0, {copies - 1})")).alias("__c"),
        "vec_id",
        "embedding",
    ).selectExpr(
        f"vec_id + __c * {10_000_000}L AS vec_id",
        f"concat(slice(embedding, __c % {dim} + 1, {dim} - __c % {dim}), "
        f"slice(embedding, 1, __c % {dim})) AS embedding",
    )


def measure(spark) -> list[str]:
    from bigdatastructure_a5_spark.operators.similarity import (
        auto_cells,
        auto_probe,
        brute_force_topk,
        fit_centroids_sample,
        ivf_topk,
        py_cosine,
        with_ivf_cells,
    )

    rows = []
    copy_points = (
        tuple(int(a) for a in sys.argv[1:]) if len(sys.argv) > 1 else (1, 10, 100, 1000)
    )
    for copies in copy_points:
        emb = scaled_embeddings(spark, copies).persist()
        n = emb.count()
        # held-out probes: deterministic spread of corpus vectors
        qvs = [
            [float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id")
            .limit(1 + 37 * (N_QUERIES - 1))
            .collect()[:: 37]
        ]
        exact = {
            i: [r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()]
            for i, qv in enumerate(qvs)
        }
        auto_n = auto_cells(n)
        # one index build per CODEBOOK; probe width is a per-query knob on
        # the same structure, so the probe-dial row reuses the auto build
        # (charging it a second build would both waste the run and print a
        # confusingly-variant 'build secs' for identical work)
        for cells_req, probe_cfgs in (
            (16, [("fixed 16/4", 4)]),
            (
                auto_n,
                [
                    ("auto sqrt(n)", None),  # auto_probe of the fitted size
                    ("auto, 2x probes", -2),  # 2x auto_probe
                ],
            ),
        ):
            # ---- index build (write-time, amortized over all queries) ----
            t0 = time.perf_counter()
            mat = fit_centroids_sample(emb, cells_req)
            cents = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
            celled = with_ivf_cells(emb, cents, "embedding", "__cell").persist()
            celled.count()  # materialize the assignment
            t_build = time.perf_counter() - t0
            for label, probe_req in probe_cfgs:
                if probe_req is None:
                    probe_n = auto_probe(len(cents))
                elif probe_req < 0:
                    probe_n = -probe_req * auto_probe(len(cents))
                else:
                    probe_n = probe_req
                # exact-scored rows: corpus rows inside the probed cells of
                # the FIRST query (cells are query-dependent; representative)
                scored_cells = sorted(
                    ((py_cosine(qvs[0], cv), cid) for cid, cv in cents),
                    key=lambda t: (-t[0], t[1]),
                )
                probed = [cid for _, cid in scored_cells[:probe_n]]
                scanned = celled.filter(F.col("__cell").isin(probed)).count()
                hits = total = 0
                t0 = time.perf_counter()
                for i, qv in enumerate(qvs):
                    got = [
                        r.vec_id
                        for r in ivf_topk(
                            emb,
                            qv,
                            k=10,
                            centroids=cents,
                            n_probe=probe_n,
                            celled=celled,
                        ).collect()
                    ]
                    hits += len(set(got) & set(exact[i]))
                    total += len(exact[i])
                per_q = (time.perf_counter() - t0) / len(qvs)
                build_cell = f"{t_build:.1f}" if label != "auto, 2x probes" else "(shared)"
                rows.append(
                    f"| {copies}x | {n:,} | {label} | {len(cents)} | "
                    f"{probe_n} | {scanned:,} | {scanned / n:.1%} | "
                    f"{hits / total:.0%} | {build_cell} | {per_q:.2f} |"
                )
                print(rows[-1])
            celled.unpersist()
        emb.unpersist()
    return rows


def main() -> None:
    spark = get_spark("ivf-sizing")
    spark.sparkContext.setLogLevel("ERROR")
    rows = measure(spark)
    section = "\n".join(
        [
            SECTION,
            "",
            "`tools/ivf_sizing.py`: Lloyd-codebook IVF on x1/x10/x100/",
            "x1000 of the sf0.1 embeddings (2k to 2M vectors, the §4",
            "rotation construction): fixed",
            "(16 cells, 4 probes — the pre-r7 default) vs the",
            "corpus-tracking rule now defaulted by `ivf_topk`",
            "(`auto_cells ~ sqrt(n)`, `auto_probe ~ sqrt(cells)`,",
            "Lloyd sample co-sized at 64 points/centroid), plus the same",
            "codebook at DOUBLED probes — the recall dial, which reuses",
            "the auto build ('(shared)': probe width is a per-query knob,",
            "not an index property).  'build' is the",
            "write-time cost paid ONCE per corpus (codebook fit + cell",
            "assignment, with_ivf_cells — Arrow/BLAS above",
            "IVF_SQL_MAX_CELLS=32 cells, rendered SQL below); secs/query",
            "is the serving path over the prebuilt celled corpus",
            "(`ivf_topk(celled=...)`: probe-rank + IN-filter + exact",
            "scoring).  'exact-scored' is the corpus rows inside the",
            "probed cells — the per-query work; recall@10 is against",
            f"brute force over {N_QUERIES} held-out query vectors.",
            "Recall caveat at x1000: the rotation construction has only",
            "dim=64 distinct rotations, so above x64 every vector gains",
            "EXACT duplicates; a query's true top-10 is then dominated by",
            "its own copies, which land in its cell by construction, and",
            "recall saturates at 100% for every config — the informative",
            "columns at that scale are scanned share and build cost.  The",
            "registered gate query `sim_ann_ivf` keeps its pinned (16, 4)",
            "seed-point codebook on the rendered-SQL assignment so its",
            "DuckDB oracle stays bit-exact.",
            "",
            "| corpus | n vecs | config | cells | probes | exact-scored | "
            "% of corpus | recall@10 | build secs | secs/query |",
            "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
            *rows,
            "",
            "Reading: the fixed 16-cell codebook holds its scanned share",
            "~constant (~n/4 at 4 probes) — per-query work grows linearly",
            "with the corpus, a quarter-brute-force at any scale.  The",
            "sqrt(n) rule's scanned share FALLS with n (probe_n * n /",
            "cells ~ n^(3/4)), which is the whole point: ~5% of the corpus",
            "at 100x and ~2.6% at 1000x (2M vectors, a 1,414-cell",
            "codebook — the regime where the assignment MUST be the",
            "Arrow/BLAS stage: a 1,414-entry literal SQL argmax does not",
            "realistically compile, and the whole build — hash-range",
            "sample, driver Lloyd on 90k vectors, BLAS assignment over",
            "2M — lands under 40 s, write-time).  What the",
            "falling share costs is recall — on this near-uniform rotated",
            "corpus (the hardest case for a clustering index: true",
            "neighbors spread across cells) recall@10 drops as the probed",
            "share shrinks, and the dial that buys it back at unchanged",
            "codebook and ~2x scan is n_probe (the doubled-probe rows).",
            "Production rule: size cells by sqrt(n) for the storage",
            "layout, then tune n_probe to the recall target — identical",
            "in spirit to FAISS's nlist/nprobe split.  Same shape as §4's",
            "planes table: the structural knob must track root-of-n or",
            "the structure saturates into brute force; the per-query knob",
            "(probes) then prices recall in scanned rows.",
        ]
    )
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
    path.write_text(head + "\n" + section + "\n" + (("\n" + tail) if tail else ""))
    print(f"updated {path}")


if __name__ == "__main__":
    main()

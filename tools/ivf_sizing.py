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
cell assignment over the corpus, with_ivf_cells, and the
partitioned-by-cell WRITE) is timed separately and amortized: it is the
write-time cost — at 100 TB the corpus is stored partitioned by cell —
so charging it to every query (as the pre-r7 version of this tool did)
mismeasured the serving path by ~40x at the 447-cell point.

VERDICT r7 items 2+4: serving is now timed from the cell-partitioned
STORED layout (write.partitionBy(cell) + read back, so the probe filter
prunes at the source as PartitionFilters — the r7 version served from an
un-partitioned persisted frame, so every probe still scanned all rows
and the x1000 wall-clock column contradicted the scanned-share win), a
per-config warm-up rep is excluded (median of N_REPS timed reps), and
the xN corpus adds a deterministic per-copy JITTER seeded from
(vec_id, copy, dim index) via Spark's murmur3 hash — above x64 the pure
rotation construction degenerates into exact duplicates, a query's true
top-10 is its own copies which land in its cell by construction, and
recall saturates at 100% for every config; the jitter keeps every vector
distinct.  Jitter alone is NOT enough at x1000: a corpus-member query's
top-10 is its own ~15-copy jitter cloud, which Lloyd keeps interior to
one cell at any measured amplitude (0.03 and 0.1 both re-saturate).  So
the recall probes are held-out MIDPOINTS normalize(v_a + v_b) of corpus
pairs from different rotation classes — a query model whose true
neighbors straddle two cell neighborhoods, the regime recall exists to
price — and the column discriminates configs at 2M vectors.

Per-query wall is probe-rank + cell filter + exact scoring over the
stored celled corpus, the ivf_topk(celled=...) shape.  Owns the "## 12."
section of EXPERIMENTS.md (same splice protocol as bench_variance /
skew_experiment).

Usage: python tools/ivf_sizing.py [copies ...]   (default: 1 10 100 1000)
"""

from __future__ import annotations

import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdatastructure_a5_spark.session import get_spark  # noqa: E402

SECTION = "## 12. IVF codebook sizing: cells ~ sqrt(n), measured"

TESTDATA = "/root/testdata/sf0.1"
N_QUERIES = 5
N_REPS = 3  # timed serving reps per config; one extra warm-up rep excluded
#: per-element jitter amplitude for the xN corpus (base vectors are
#: unit-norm, |elem| ~ 0.1): uniform-ish in [-JITTER, JITTER] from a
#: murmur3 hash of (vec_id, copy, dim index) — deterministic, content-
#: addressed (layout-independent), and unique per copy, so no two copies
#: are ever exact duplicates.  Amplitude calibrated so copy clouds
#: straddle Voronoi boundaries at the x1000 codebook (recall@10
#: discriminates configs) while copies of a base vector remain each
#: other's nearest neighbors.
JITTER = 0.03
STORE_ROOT = Path("/tmp/bds_ivf_sizing")


def scaled_embeddings(spark, copies: int, jitter: float = JITTER):
    """x{copies} corpus by the §4 construction: disjoint id ranges, each
    copy's vector rotated by c positions (norm-preserving, spreads
    directions so cells stay meaningful), plus a deterministic per-copy
    jitter (hash-seeded, see JITTER) so copies above the dim=64 rotation
    period are near- rather than exact duplicates.

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
    rotated = (
        f"concat(slice(embedding, __c % {dim} + 1, {dim} - __c % {dim}), "
        f"slice(embedding, 1, __c % {dim}))"
    )
    if jitter:
        rotated = (
            f"transform({rotated}, (x, j) -> x + {jitter!r}D * "
            f"(pmod(hash(vec_id, __c, j), 2001) - 1000) / 1000.0D)"
        )
    return emb.select(
        F.explode(F.expr(f"sequence(0, {copies - 1})")).alias("__c"),
        "vec_id",
        "embedding",
    ).selectExpr(
        f"vec_id + __c * {10_000_000}L AS vec_id",
        f"{rotated} AS embedding",
    )


def midpoint_probes(emb, copies: int, n_queries: int) -> list[list[float]]:
    """Held-out recall probes: midpoints of corpus vector pairs from
    DIFFERENT rotation classes (shared by §12 ivf_sizing and §14
    pq_sizing — one derivation so their recall columns can't drift).

    The deterministically-spread low-id draw is all copy 0 — the identity
    rotation class — so (ADVICE r8) the B parent of each pair is
    re-fetched as the copy-1 (rotate-by-1 + jitter) twin of its base
    vector: same id + the 10M copy stride.  At copies == 1 there is only
    one class and the pairs are distinct copy-0 bases."""
    parents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id")
        .limit(1 + 37 * (2 * n_queries - 1))
        .collect()[::37]
    ]
    base_vs = [v for _, v in parents]
    if copies > 1:
        twin_ids = [pid + 10_000_000 for pid, _ in parents[1::2]]
        twins = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin(twin_ids)).collect()
        }
        base_vs = [
            twins[pid + 10_000_000] if idx % 2 else v
            for idx, (pid, v) in enumerate(parents)
        ]
    return [
        [a + b for a, b in zip(base_vs[2 * i], base_vs[2 * i + 1])]
        for i in range(len(base_vs) // 2)
    ]


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
        # held-out probes: MIDPOINTS of deterministically-spread corpus
        # vector pairs (normalize is a no-op under cosine scoring).  A
        # corpus-member query's top-10 is its own jitter cloud, which the
        # quantizer keeps in one cell — recall saturates; a midpoint's true
        # neighbors split across both parents' cell neighborhoods, so
        # recall prices the probe width (see module docstring)
        qvs = midpoint_probes(emb, copies, N_QUERIES)
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
            # ---- index build (write-time, amortized over all queries):
            # codebook fit + cell assignment + the partitioned-by-cell
            # parquet WRITE — the stored layout IS the index at 100 TB ----
            t0 = time.perf_counter()
            mat = fit_centroids_sample(emb, cells_req)
            cents = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
            store = STORE_ROOT / f"x{copies}_c{len(cents)}"
            (
                with_ivf_cells(emb, cents, "embedding", "__cell")
                # cluster each cell's rows into one task before the write:
                # without this, every one of the ~32 write tasks emits a
                # file per cell it sees (~32 * cells tiny files)
                .repartition(
                    spark.sparkContext.defaultParallelism, F.col("__cell")
                )
                .write.mode("overwrite")
                .partitionBy("__cell")
                .parquet(str(store))
            )
            t_build = time.perf_counter() - t0
            stored = spark.read.parquet(str(store))
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
                scanned = stored.filter(F.col("__cell").isin(probed)).count()
                hits = total = 0
                rep_secs = []
                for rep in range(1 + N_REPS):  # rep 0 = warm-up, untimed
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
                                celled=stored,
                            ).collect()
                        ]
                        if rep == 0:  # recall identical across reps
                            hits += len(set(got) & set(exact[i]))
                            total += len(exact[i])
                    if rep > 0:
                        rep_secs.append(
                            (time.perf_counter() - t0) / len(qvs)
                        )
                per_q = statistics.median(rep_secs)
                build_cell = f"{t_build:.1f}" if label != "auto, 2x probes" else "(shared)"
                rows.append(
                    f"| {copies}x | {n:,} | {label} | {len(cents)} | "
                    f"{probe_n} | {scanned:,} | {scanned / n:.1%} | "
                    f"{hits / total:.0%} | {build_cell} | {per_q:.2f} |"
                )
                print(rows[-1])
            shutil.rmtree(store, ignore_errors=True)
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
            "rotation construction plus a deterministic per-copy jitter",
            f"hash-seeded from (vec_id, copy, dim) at amplitude {JITTER}",
            "— above x64 pure rotation degenerates into exact duplicates):",
            "fixed (16 cells, 4 probes — the pre-r7 default) vs the",
            "corpus-tracking rule now defaulted by `ivf_topk`",
            "(`auto_cells ~ sqrt(n)`, `auto_probe ~ sqrt(cells)`,",
            "Lloyd sample co-sized at 64 points/centroid), plus the same",
            "codebook at DOUBLED probes — the recall dial, which reuses",
            "the auto build ('(shared)': probe width is a per-query knob,",
            "not an index property).  'build' is the",
            "write-time cost paid ONCE per corpus: codebook fit + cell",
            "assignment (with_ivf_cells — Arrow/BLAS above",
            "IVF_SQL_MAX_CELLS=32 cells, rendered SQL below) + the",
            "partitioned-by-cell parquet WRITE, because the stored layout",
            "IS the index.  secs/query (VERDICT r7 item 2) is the serving",
            "path over that STORED layout — `ivf_topk(celled=...)` on the",
            "read-back frame, so the probe IN-filter prunes at the source",
            "as PartitionFilters; median of",
            f"{N_REPS} reps after an excluded warm-up rep.  The r7 table",
            "served from an un-partitioned persisted frame: every probe",
            "scanned all rows, and at x1000 the auto config measured",
            "SLOWER than fixed despite 10x less scoring — the column",
            "contradicted the rule it justifies.  'exact-scored' is the",
            "corpus rows inside the probed cells — the per-query work;",
            f"recall@10 is against brute force over {N_QUERIES} held-out",
            "MIDPOINT probes (v_a + v_b of corpus pairs from different",
            "rotation classes, VERDICT r7 item 4): a corpus-member",
            "query's top-10 is its own jitter cloud, which the quantizer",
            "keeps interior to one cell at every amplitude tried (recall",
            "re-saturates at 100%); a midpoint's true neighbors straddle",
            "both parents' cell neighborhoods, so the recall column",
            "discriminates probe widths at 2M vectors.  The registered",
            "gate query `sim_ann_ivf` keeps its pinned (16, 4) seed-point",
            "codebook on the rendered-SQL assignment so its DuckDB oracle",
            "stays bit-exact.",
            "",
            "| corpus | n vecs | config | cells | probes | exact-scored | "
            "% of corpus | recall@10 | build secs | secs/query |",
            "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
            *rows,
            "",
            "Reading: the fixed 16-cell codebook holds its scanned share",
            "~constant (~n/4 at 4 probes) — per-query work grows linearly",
            "with the corpus, a quarter-brute-force at any scale, and on",
            "the stored layout the wall-clock now SHOWS it.  The",
            "sqrt(n) rule's scanned share FALLS with n (probe_n * n /",
            "cells ~ n^(3/4)): ~5% of the corpus",
            "at 100x and ~2.7% at 1000x (2M vectors, a 1,414-cell",
            "codebook — the regime where the assignment MUST be the",
            "Arrow/BLAS stage: a 1,414-entry literal SQL argmax does not",
            "realistically compile, and the whole build — hash-range",
            "sample, driver Lloyd on 90k vectors, BLAS assignment over",
            "2M, partitioned write — stays write-time-cheap).  With",
            "serving read from the cell-partitioned store, secs/query",
            "finally tracks the scanned share instead of contradicting",
            "it.  What the falling share costs is recall on boundary-",
            "straddling queries — the midpoint probes drop as the probed",
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

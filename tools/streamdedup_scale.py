"""Streaming dedup state: per-batch cost vs history, and the compaction
reset (VERDICT r11 item 4).

The band/shingle parquet stores behind streaming/dedup.py are
append-only — one parquet file set per batch — so batch N's
candidate/verify joins list and footer-read N-1 earlier appends: the
same FILE-COUNT history tax §20 measured for the packer's carry store,
but against stores that are CORPUS-sized (one row per doc per band /
one shingle array per doc) rather than O(shards).  This tool measures
the tax directly and then prices the cure: K constant-size microbatches
through ``process_batch`` (every batch re-reads the growing index),
early-window vs late-window medians, then ONE ``compact_dedup_state``
pass and a post-compaction batch window — the per-batch cost must fall
back toward the early median while the keep decisions stay identical
(the equivalence is pytest-pinned; here we only count kept docs).

Owns the "## 21." section of EXPERIMENTS.md (same splice protocol as
the other measurement tools).

Usage: python tools/streamdedup_scale.py [n_batches] [docs_per_batch]
       (defaults: 40 x 200 docs)
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SECTION = "## 21. Streaming dedup state: history tax and compaction reset"
#: vocabulary large enough that unrelated documents share no trigram
#: shingles (candidates stay ANSWER-sized — only the planted repeats
#: collide); a tiny pool would make every (batch x corpus) pair a
#: candidate and the measurement would time a cross product, not the
#: state reads
VOCAB = 50_000


def _word(expr):
    return F.concat(F.lit("w"), F.pmod(expr, F.lit(VOCAB)).cast("string"))


def _text_of(src):
    """~12 effectively-unique words derived from a source id."""
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda i: _word(src * 7919 + i * 104729),
        ),
    )


def _batch(spark, batch_ix: int, docs_per_batch: int):
    """Deterministic synthetic docs: every 10th doc an exact repeat of a
    doc from the PREVIOUS batch, so the cross-batch candidate/verify
    tier always has true positives; everything else is shingle-unique."""
    base = batch_ix * docs_per_batch
    ids = spark.range(base, base + docs_per_batch).select(
        F.col("id").alias("doc_id")
    )
    repeat_src = F.col("doc_id") - docs_per_batch - (F.col("doc_id") % 10)
    return ids.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") >= docs_per_batch),
            _text_of(repeat_src),
        )
        .otherwise(_text_of(F.col("doc_id")))
        .alias("text"),
    )


def measure(spark, n_batches: int, docs_per_batch: int, tmp: Path):
    """A/B design: per-batch cost also grows with CORPUS size (the
    cross-batch verify join scans the shingle store), so a naive
    before/after-compaction comparison conflates the file-count tax
    with corpus growth.  Run A streams n+tail batches uncompacted; run
    B streams n batches, compacts once, then the SAME tail batches —
    the tail-window medians compare identical corpus and batch indices,
    isolating the file-count term, and the keep-sets must be equal."""
    from bigdatastructure_a5_spark.streaming.dedup import (
        compact_dedup_state,
        process_batch,
    )

    tail = 8
    # INTERLEAVED A/B: per-batch wall also drifts with SESSION age
    # (accumulated listener/UI state over hundreds of actions), so
    # running A fully then B fully would time B's tail on an older,
    # slower session.  Alternating A-batch/B-batch gives both stores
    # the same session age at every batch index; only B compacts.
    states = {k: str(tmp / f"state_{k}") for k in ("A", "B")}
    outs = {k: str(tmp / f"out_{k}") for k in ("A", "B")}
    walls: dict[str, list] = {"A": [], "B": []}
    compact_wall = files_before = files_after = None
    for i in range(n_batches + tail):
        if i == n_batches:
            files_before = sum(
                1 for _ in Path(states["B"]).rglob("*.parquet")
            )
            t0 = time.perf_counter()
            compact_dedup_state(spark, states["B"])
            compact_wall = time.perf_counter() - t0
            files_after = sum(
                1 for _ in Path(states["B"]).rglob("*.parquet")
            )
        b = _batch(spark, i, docs_per_batch)
        for k in ("A", "B"):
            t0 = time.perf_counter()
            process_batch(spark, b, states[k], outs[k])
            walls[k].append(time.perf_counter() - t0)
        if i % 10 == 0:
            print(
                f"  batch {i}: A {walls['A'][-1]:.2f}s"
                f"  B {walls['B'][-1]:.2f}s"
            )
    kept_a = {r.doc_id for r in spark.read.parquet(outs["A"]).collect()}
    kept_b = {r.doc_id for r in spark.read.parquet(outs["B"]).collect()}
    assert kept_a == kept_b, "compaction changed the keep-set"
    runs = {}
    for k, label in (("A", "A_uncompacted"), ("B", "B_compacted")):
        runs[label] = {
            "early": statistics.median(walls[k][1:11]),
            "pre_tail": statistics.median(
                walls[k][n_batches - 10 : n_batches]
            ),
            "tail": statistics.median(walls[k][n_batches:]),
            "compact_wall": compact_wall,
            "files_before": files_before,
            "files_after": files_after,
        }
    return runs, tail


def main() -> None:
    import tempfile

    from bigdatastructure_a5_spark.session import get_spark

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    docs_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("streamdedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="streamdedup_") as tmp:
        runs, tail = measure(spark, n_batches, docs_per_batch, Path(tmp))

    a, b = runs["A_uncompacted"], runs["B_compacted"]
    rows = [
        f"| A: uncompacted | {a['early']:.2f} | {a['pre_tail']:.2f} | "
        f"{a['tail']:.2f} | — | — | — |",
        f"| B: compacted at batch {n_batches} | {b['early']:.2f} | "
        f"{b['pre_tail']:.2f} | {b['tail']:.2f} | "
        f"{b['files_before']} -> {b['files_after']} | "
        f"{b['compact_wall']:.2f} | "
        f"{a['tail'] / b['tail']:.2f}x |",
    ]
    for r in rows:
        print(r)

    section = "\n".join(
        [
            SECTION,
            "",
            "`tools/streamdedup_scale.py`: the band/shingle stores behind",
            "streaming/dedup.py are append-only (one parquet file set per",
            "batch x shuffle partition), so every microbatch's",
            "candidate/verify joins pay a listing + footer-read tax that",
            "grows with BATCH COUNT — the §20 mechanism, but on",
            "corpus-sized index stores.  Per-batch cost ALSO grows with",
            "corpus size (the verify join scans the shingle store) and",
            "drifts with session age, so the design is INTERLEAVED A/B:",
            "each of the",
            f"{n_batches}+{tail} constant-size batches",
            f"({docs_per_batch:,} ~12-word docs, every 10th an exact",
            "repeat from the previous batch so cross-batch verification",
            "always fires) is processed into store A then store B in the",
            "same session — identical corpus, batch index, and session",
            f"age — and only B compacts ONCE after batch {n_batches - 1}",
            "(`compact_dedup_state`, r12: DISTINCT + staging swap).",
            "Keep-sets asserted equal.",
            "",
            "| run | early s/batch | pre-tail s/batch | tail s/batch |"
            " files at compaction | compact s | tail speedup |",
            "| --- | --- | --- | --- | --- | --- | --- |",
            *rows,
            "",
            "Reading: the tail columns compare the SAME batches over the",
            "same corpus — their ratio is the pure file-count tax at",
            f"this depth ({n_batches} batches x 32 shuffle partitions of",
            "appends), which compaction resets without touching content",
            "(pytest pins dedup-across-compaction output identical,",
            "bucket partitioning preserved).  The tax compounds at",
            "production cadence (thousands of batches); compact on the",
            "same maintenance window as the packer's carry store,",
            "between stream runs — the r12 lock pair",
            "(_COMPACTION_IN_PROGRESS/_WRITER_ACTIVE) turns a",
            "compaction-vs-writer race into a loud error instead of",
            "silent state loss.",
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
    path.write_text(head + "\n" + section + "\n\n" + tail)
    print(f"updated {path}")


if __name__ == "__main__":
    main()

"""Dedup index maintenance at scale: retraction/compaction wall vs
STORE SIZE (the complement of §21's file-count story).

§21 measured the history tax the maintenance ops reset (file counts);
this tool measures the ops THEMSELVES as data grows: the band/shingle
stores are CORPUS-sized, and both ``retract_documents`` and
``compact_dedup_state`` rewrite them whole through the staging-swap
protocol — the 100 TB design claim is that each rewrite is a single
linear distributed pass (retraction: shuffle-free broadcast anti-join
+ write; compaction: one size-scaled repartition + DISTINCT + write;
no driver collect), so its wall must grow ~linearly with store rows
and never with the RETRACTED-set size beyond the broadcast id list.

Method: write synthetic stores DIRECTLY at geometric sizes (the ops'
input is just the two parquet stores — building them via real ingest
would only add noise), then time ``retract_documents`` of a fixed 1%
id slice and ``compact_dedup_state`` at each size.  Correctness is
asserted inline: exactly the retracted ids' rows disappear (both
stores), everything else survives bit-for-bit by count, and bucket
partition columns are preserved.  A per-4x-step wall ratio <= ~5 reads
linear-or-better (noise allowance; perfectly linear = 4).

Owns the "## 22." section of EXPERIMENTS.md (same splice protocol as
the other measurement tools).

Usage: python tools/retraction_scale.py [base_docs] [steps]
       (defaults: 20_000 docs, 3 sizes x4 apart -> 20k/80k/320k docs,
        i.e. 0.64M/2.56M/10.24M band rows at 32 bands/doc)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SECTION = "## 22. Dedup index maintenance: retraction/compaction wall vs store size"

BANDS = 32
SHINGLES_PER_DOC = 12


def build_stores(spark, state_dir: str, n_docs: int, buckets: int) -> None:
    """Synthetic band/shingle stores shaped exactly like process_batch's
    appends: one (id, band, bhash) row per doc per band (+ bucket
    column), one (id, shingles) row per doc."""
    ids = spark.range(n_docs).select(F.col("id").cast("bigint"))
    bands = (
        ids.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
        )
        .withColumn(
            "bhash",
            F.xxhash64(F.col("id") * F.lit(BANDS) + F.col("band")),
        )
        .withColumn("bucket", F.pmod(F.col("bhash"), F.lit(buckets)))
    )
    shingles = ids.select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.lit(SHINGLES_PER_DOC)),
            lambda i: F.concat(
                F.lit("s"), (F.col("id") * 31 + i).cast("string")
            ),
        ).alias("shingles"),
    )
    from bigdatastructure_a5_spark.streaming.state import join_path

    bands.write.mode("overwrite").partitionBy("bucket").parquet(
        join_path(state_dir, "bands")
    )
    shingles.write.mode("overwrite").parquet(
        join_path(state_dir, "shingles")
    )


def measure(spark, base_docs: int, steps: int, tmp: Path) -> list[dict]:
    from bigdatastructure_a5_spark.streaming.dedup import (
        compact_dedup_state,
        retract_documents,
    )
    from bigdatastructure_a5_spark.streaming.state import join_path

    # unrecorded warm-up: the first staging-swap of a fresh session pays
    # one-time codegen/fs-client costs an order above steady state
    # (observed 34s vs 3s on an identical store) — burn them on a tiny
    # store so the recorded sizes compare like for like
    warm = str(tmp / "state_warm")
    build_stores(spark, warm, 2_000, buckets=8)
    retract_documents(
        spark,
        warm,
        spark.range(2_000).filter(F.col("id") % 100 == 0).select(
            F.col("id").alias("doc_id")
        ),
    )
    compact_dedup_state(spark, warm)

    from bigdatastructure_a5_spark.streaming.state import fs_size_bytes

    rows = []
    for s in range(steps):
        n = base_docs * 4**s
        w_retract = w_compact = float("inf")
        store_b = 0
        # min-of-2: single observations on these fs-op-heavy paths carry
        # multi-second scheduler tails (§8's dedup_retraction row)
        for rep in range(2):
            state = str(tmp / f"state_{n}_{rep}")
            build_stores(spark, state, n, buckets=8)
            store_b = fs_size_bytes(spark, state)
            # fixed 1% slice, spread across the id space
            retract = spark.range(n).filter(F.col("id") % 100 == 0).select(
                F.col("id").alias("doc_id")
            )
            n_retract = n // 100 + (1 if n % 100 else 0)

            t0 = time.perf_counter()
            retract_documents(spark, state, retract)
            w_retract = min(w_retract, time.perf_counter() - t0)

            bands = spark.read.parquet(join_path(state, "bands"))
            sh = spark.read.parquet(join_path(state, "shingles"))
            assert bands.filter(F.col("id") % 100 == 0).count() == 0
            assert sh.filter(F.col("id") % 100 == 0).count() == 0
            assert bands.count() == (n - n_retract) * BANDS
            assert sh.count() == n - n_retract
            assert "bucket" in bands.columns  # partition column preserved

            t0 = time.perf_counter()
            compact_dedup_state(spark, state)
            w_compact = min(w_compact, time.perf_counter() - t0)
            assert (
                spark.read.parquet(join_path(state, "bands")).count()
                == (n - n_retract) * BANDS
            )
            # drop this rep's stores NOW: letting reps accumulate keeps
            # tens of GB of freshly-written dirty pages queued for
            # writeback, and the next rep's ops then compete with the
            # flush — measured as 2x wall noise on the big rungs
            import shutil

            shutil.rmtree(state, ignore_errors=True)

        rows.append(
            {
                "docs": n,
                "band_rows": n * BANDS,
                "store_gb": round(store_b / 2**30, 2),
                "retract_s": round(w_retract, 2),
                "compact_s": round(w_compact, 2),
                # effective I/O throughput, using each op's store-bytes
                # traffic multiplier: retraction reads + rewrites the
                # stores once (2x bytes); compaction adds a full shuffle
                # round-trip of the same bytes (4x).  Compare against the
                # box's MEASURED sequential ceiling (dd direct: 172 MB/s
                # write / 305 MB/s read here) — a rung pinned near it is
                # bandwidth-bound, not compute-bound.
                "retract_mbps": round(2 * store_b / 2**20 / w_retract),
                "compact_mbps": round(4 * store_b / 2**20 / w_compact),
            }
        )
        print(
            f"  docs={n}: store {store_b / 2**30:.2f}GB "
            f"retract {w_retract:.2f}s compact {w_compact:.2f}s"
        )
    return rows


def render(rows: list[dict], base_docs: int) -> str:
    lines = [
        SECTION,
        "",
        f"`tools/retraction_scale.py {base_docs} {len(rows)}`: synthetic "
        f"band/shingle stores shaped like process_batch's appends ({BANDS} "
        "band rows + 1 shingle row per doc, hive-bucketed bands), sizes x4 "
        "apart; `retract_documents` of a fixed 1% id slice, then "
        "`compact_dedup_state`, min-of-2 per size after an unrecorded "
        "warm-up pass (a fresh session's first staging-swap pays one-time "
        "codegen/fs-client costs an order above steady state).  Both ops "
        "rewrite the stores whole through the staging-swap protocol in one "
        "distributed pass (retraction: shuffle-free broadcast anti-join + "
        "write; compaction: size-scaled repartition + DISTINCT + write — "
        "see streaming/dedup's `_rewrite_partitions`; the only driver-side "
        "data is the broadcast retract-id list), so wall must track store "
        "size ~linearly: a per-4x-step "
        "ratio <= ~5 reads linear-or-better.  Correctness asserted inline "
        "per size: exactly the retracted ids' rows disappear from BOTH "
        "stores, survivor counts are exact, bucket partitioning survives "
        "the rewrite.  The MB/s columns are effective I/O throughput "
        "(retraction moves ~2x store bytes: read + rewrite; compaction "
        "~4x: a shuffle round-trip on top) — read against the box's "
        "dd-measured sequential ceiling of ~172 MB/s write / 305 MB/s "
        "read: a rung pinned near it is BANDWIDTH-bound, and a wall "
        "ratio above the band there is the page cache giving out (a "
        "regime transition, one-time), not a widening compute curve — "
        "wall = bytes/ceiling IS linear in bytes, and aggregate I/O is "
        "exactly the resource a real cluster scales horizontally.",
        "",
        "| docs | band rows | store GB | retract s | r | MB/s "
        "| compact s | r | MB/s |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    prev = None
    for r in rows:
        rr = f"{r['retract_s'] / prev['retract_s']:.1f}x" if prev else ""
        rc = f"{r['compact_s'] / prev['compact_s']:.1f}x" if prev else ""
        lines.append(
            f"| {r['docs']:,} | {r['band_rows']:,} | {r['store_gb']} "
            f"| {r['retract_s']} | {rr} | {r['retract_mbps']} "
            f"| {r['compact_s']} | {rc} | {r['compact_mbps']} |"
        )
        prev = r
    # scalar max over EVERY step ratio of BOTH ops (a tuple-max would
    # compare lexicographically and could hide a superlinear compact
    # ratio behind a bigger retract ratio — r13 review finding), keeping
    # the destination rung + op so an above-band step can be attributed
    ratios = [
        (r, b, op)
        for a, b in zip(rows, rows[1:])
        for r, op in (
            (b["retract_s"] / a["retract_s"], "retract"),
            (b["compact_s"] / a["compact_s"], "compact"),
        )
    ]
    if ratios:
        worst, at, op = max(ratios)
        # 100 MB/s ~ 60% of the dd-measured 172 MB/s sequential-write
        # ceiling: effective throughput above it means the op is moving
        # bytes about as fast as this box's disk can — bandwidth-bound
        at_ceiling = at[f"{op}_mbps"] >= 100
        if worst <= 5:
            verdict = (
                "linear-or-better: the maintenance ops scale with the "
                "store, not with history or retraction count."
            )
        elif at_ceiling:
            verdict = (
                f"above the wall-ratio band, but the step lands with "
                f"{op} at {at[f'{op}_mbps']} MB/s effective — pinned at "
                "this box's measured disk ceiling.  That is the page "
                "cache running out (smaller rungs rewrite through RAM), "
                "a one-time regime transition: in the bandwidth-bound "
                "regime wall = bytes/ceiling, linear in store size, and "
                "aggregate disk bandwidth is what a real cluster scales "
                "horizontally."
            )
        else:
            verdict = (
                "ABOVE the linear band and NOT bandwidth-pinned — "
                "investigate before trusting the 100 TB maintenance "
                "story."
            )
        lines += [
            "",
            f"Worst per-4x-step ratio {worst:.1f}x ({op}, at "
            f"{at['docs']:,} docs) — " + verdict,
            "",
            "History: the first 164M-row rung (r14) ran 9.8x/5.2x — the "
            "then-shared anti-join + DISTINCT rewrite pinned its shuffle "
            "at defaultParallelism, and each task's ~5M-row aggregate "
            "state fell into spill (probe on the identical store: 253s "
            "at 32 partitions, 56s at 128, 142s at 512).  Fixed by "
            "making retraction DISTINCT-free (removing rows can't create "
            "duplicates) and scaling compaction's partition count with "
            "store bytes at 16 MiB/partition: 113s->10.7s retract, "
            "62.5s->32.2s compact at that rung.  The first 655M-row run "
            "then read 11x/4.9x at the top rung with both ops pinned at "
            "the disk ceiling — harness artifact, not operator: earlier "
            "reps' ~30GB of undeleted stores sat queued for writeback "
            "and the timed ops competed with the flush; dropping each "
            "rep's stores immediately restored 3.5x/4.7x (retract "
            "119.6s->42.5s at identical code).",
            "",
        ]
    else:
        lines += ["", "(single size — no step ratios to verdict)", ""]
    return "\n".join(lines)


def main() -> None:
    import tempfile

    from bigdatastructure_a5_spark.session import get_spark

    base_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("retraction-scale")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="retr_scale_") as tmp:
        rows = measure(spark, base_docs, steps, Path(tmp))
    section = render(rows, base_docs)
    path = REPO / "EXPERIMENTS.md"
    text = path.read_text()
    if SECTION in text:
        head, rest = text.split(SECTION, 1)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        path.write_text(head + section + "\n" + tail)
    else:
        path.write_text(text.rstrip() + "\n\n" + section + "\n")
    print("updated", path)


if __name__ == "__main__":
    raise SystemExit(main())

"""Measured contrast: AQE skew-join splitting vs manual salting.

VERDICT r5 item 4.  `operators/skew.py` claims salting is "the tool when
AQE's split partitions still overwhelm a task, or for aggregations"; this
tool turns that prose into numbers and owns the "## 10." section of
EXPERIMENTS.md (same splice protocol as bench_variance / scaling_sweep).

Setup: a genuinely skewed x10 fact — ten copies of sf0.1 lineitem
(~6M rows) with HALF of all rows remapped to ONE hot part key — joined to
the sf0.1 part dimension.  Broadcast is disabled for the join cases: with
a broadcastable dimension there IS no skew problem (the fact never
shuffles), which is itself the first line of the decision rule; the
experiment models the 100 TB case where both sides must shuffle.

Cases (identical output rows, verified):
- shuffle join, AQE skew-join OFF  — the naive baseline: the hot key's
  partition serializes ~3M rows through one task;
- shuffle join, AQE skew-join ON   — runtime split of oversized
  partitions (OptimizeSkewedJoin), thresholds lowered to fixture scale
  (production defaults: 256 MiB / factor 5 — at 100 TB real partitions
  trip them without tuning);
- operators/skew.salted_join(16)   — the manual rewrite.

A second table repeats the contrast with a downstream SUM aggregation on
the hot key, because join-time skew PROPAGATES: the unsalted join leaves
the hot key concentrated in one partition, so the agg's map-side partial
aggregation for that key runs in a single task no matter what the agg
does; AQE's split restores parallelism at the price of breaking the
co-partitioning the agg could otherwise reuse.

Usage: python tools/skew_experiment.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.skew import salted_join
from bigdatastructure_a5_spark.session import get_spark

SECTION = "## 10. Skew: AQE skew-join splitting vs manual salting, measured"

TESTDATA = "/root/testdata/sf0.1"
COPIES = 10
HOT_SHARE_MOD = 2  # every 2nd row -> hot key: 50% of the fact on one key
HOT_KEY = 1


def _source_tag() -> str:
    """Content-address the cache by the source parquet (size+mtime) and the
    construction knobs, so a regenerated sf0.1 fixture can't be silently
    served stale data (ADVICE r6)."""
    import hashlib
    import os

    st = os.stat(f"{TESTDATA}/lineitem.parquet")
    key = f"{COPIES}:{HOT_SHARE_MOD}:{HOT_KEY}:{st.st_size}:{st.st_mtime_ns}"
    return hashlib.md5(key.encode()).hexdigest()[:12]


def build_skewed_fact(spark: SparkSession) -> DataFrame:
    """~6M-row lineitem with half of all part keys collapsed onto HOT_KEY.
    Cached as parquet in /tmp so reruns (and both halves of the
    experiment) read the same stable input."""
    out = Path(f"/tmp/bds_skew_fact_x{COPIES}_m{HOT_SHARE_MOD}_{_source_tag()}")
    if not (out / "_SUCCESS").exists():
        li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        copies = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(c * 10_000_000))
            for c in range(COPIES)
        ]
        fact = copies[0]
        for c in copies[1:]:
            fact = fact.unionAll(c)
        fact = fact.withColumn(
            "l_partkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_partkey"), F.lit(HOT_SHARE_MOD))
                == 0,
                F.lit(HOT_KEY).cast("bigint"),
            ).otherwise(F.col("l_partkey")),
        )
        fact.repartition(32).write.mode("overwrite").parquet(str(out))
    return spark.read.parquet(str(out))


def _timed_checksum(df: DataFrame) -> tuple[float, int, int, str]:
    """(seconds, rows, order-invariant checksum, final-plan string).

    The tail is a global aggregate of a per-row hash over EVERY column:
    it cannot be column-pruned (a bare count() lets Catalyst strip the
    payload down to the join key, whose constant-heavy shuffle partitions
    compress below any skew threshold — measured: no split ever fires),
    imposes no output partitioning requirement on the join, and doubles
    as the cross-variant result-equality check (same row multiset <=>
    same (rows, checksum)).  pmod keeps the ANSI-mode sum within int64.
    collect() runs the DataFrame's OWN QueryExecution, so executedPlan()
    afterwards is the FINAL adaptive plan."""
    chk = df.agg(
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias(
            "chk"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    t0 = time.perf_counter()
    row = chk.collect()[0]
    dt = time.perf_counter() - t0
    plan = chk._jdf.queryExecution().executedPlan().toString()
    return dt, int(row["n"]), int(row["chk"]), plan


def _final_plan(plan: str) -> str:
    return plan.split("== Initial Plan ==", 1)[0]


def _skew_splits(plan: str) -> int:
    """AQEShuffleRead operators reporting skewed splits in the final plan."""
    return sum(
        1
        for line in _final_plan(plan).splitlines()
        if "AQEShuffleRead" in line and "skewed" in line
    )


def _exchanges(plan: str) -> int:
    return sum(
        1 for line in _final_plan(plan).splitlines() if "Exchange " in line
    )


def run(spark: SparkSession) -> list[str]:
    fact = build_skewed_fact(spark)
    dim = spark.read.parquet(f"{TESTDATA}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    n_fact = fact.count()
    hot_rows = fact.filter(F.col("l_partkey") == HOT_KEY).count()

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }

    def plain_join(f: DataFrame) -> DataFrame:
        return f.join(dim, f.l_partkey == dim.p_partkey).select(
            "l_orderkey", "l_partkey", "p_brand", "l_quantity"
        )

    def salted(f: DataFrame) -> DataFrame:
        renamed = f.withColumnRenamed("l_partkey", "p_partkey")
        return salted_join(renamed, dim, key="p_partkey", salt=16).select(
            "l_orderkey",
            F.col("p_partkey").alias("l_partkey"),
            "p_brand",
            "l_quantity",
        )

    def agg_tail(joined: DataFrame) -> DataFrame:
        return joined.groupBy("l_partkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )

    rows_join: list[tuple[str, float, int, int, int, int]] = []
    rows_agg: list[tuple[str, float, int, int, int, int]] = []
    variants = (
        ("shuffle join, AQE skew OFF", False, False, plain_join),
        ("shuffle join, AQE skew ON", True, False, plain_join),
        ("shuffle join, AQE skew ON + force", True, True, plain_join),
        ("salted_join(16)", False, False, salted),
    )
    try:
        # both join sides must shuffle (the 100 TB shape): no broadcast
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # fixture-scale skew thresholds: the hot partition is ~30 MiB
        # compressed, under the 256 MiB production default; the RULE is
        # the same, only the trip point is scaled down
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB"
        )
        for label, skew_on, force, build in variants:
            conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_on else "false",
            )
            conf.set(
                "spark.sql.adaptive.forceOptimizeSkewedJoin",
                "true" if force else "false",
            )
            dt, n, chk, plan = _timed_checksum(build(fact))
            rows_join.append(
                (label, dt, n, chk, _skew_splits(plan), _exchanges(plan))
            )
            dt2, n2, chk2, plan2 = _timed_checksum(agg_tail(build(fact)))
            rows_agg.append(
                (label, dt2, n2, chk2, _skew_splits(plan2), _exchanges(plan2))
            )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
        conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")

    for fam, rows in (("join", rows_join), ("agg", rows_agg)):
        sigs = {(n, chk) for _, _, n, chk, _, _ in rows}
        assert len(sigs) == 1, f"{fam} variants disagree on results: {rows}"

    out = [
        SECTION,
        "",
        f"`tools/skew_experiment.py`: a {n_fact:,}-row fact (10x sf0.1",
        f"lineitem) with {hot_rows / n_fact:.0%} of rows on ONE part key,",
        "joined to the 20k-row part dimension with broadcast DISABLED —",
        "the shape where skew exists at all (a broadcastable dimension is",
        "always the first fix).  AQE thresholds scaled to the fixture",
        "(8 MiB vs the 256 MiB production default); every variant's result",
        "verified identical (row count + order-invariant row-hash",
        "checksum).  The timed action is an unprunable whole-row checksum",
        "aggregate, so the join really moves its payload.",
        "",
        f"Join only ({rows_join[0][2]:,} rows through the join):",
        "",
        "| variant | secs | AQE skewed reads | exchanges |",
        "| --- | --- | --- | --- |",
    ]
    for label, dt, _, _, splits, ex in rows_join:
        out.append(f"| {label} | {dt:.2f} | {splits} | {ex} |")
    out += [
        "",
        "Join + SUM aggregation GROUPED ON THE JOIN KEY "
        f"({rows_agg[0][2]:,} groups) — the co-partitioning conflict case:",
        "",
        "| variant | secs | AQE skewed reads | exchanges |",
        "| --- | --- | --- | --- |",
    ]
    for label, dt, _, _, splits, ex in rows_agg:
        out.append(f"| {label} | {dt:.2f} | {splits} | {ex} |")
    out += [
        "",
        "Reading, join-only: AQE detects the oversized partition and",
        "splits it (AQEShuffleRead skewed, SortMergeJoin(skew=true)) with",
        "no query rewrite.  Join + same-key aggregation: plain AQE",
        "declines the split — splitting would break the hash",
        "partitioning the downstream aggregate requires — so the hot",
        "partition serializes again unless `forceOptimizeSkewedJoin`",
        "buys the split with an extra exchange of the join output, while",
        "salted_join spreads the hot key with the same exchange count.",
        "",
        "Decision rule (recorded in COVERAGE.md deploy checklist):",
        "broadcast the small side if it fits (no shuffle, no skew);",
        "otherwise rely on AQE skew-join for plain join skew — runtime,",
        "rewrite-free, visible in the plan.  Reach for",
        "operators/skew.salted_join when the skew survives AQE: a join",
        "feeding a same-key aggregation (AQE declines or pays an extra",
        "shuffle; salting spreads the partial aggregation itself), or a",
        "single key so hot that even split partitions overwhelm a task.",
        "salted_agg remains the aggregation-side tool: AQE never splits",
        "aggregation partitions.",
    ]
    return out


def main() -> None:
    spark = get_spark("skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    section = "\n".join(run(spark))
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

"""The reference's Q6/Q7 sharding experiment, executed for real.

Reference (BASELINE.md, REPORT.md:150-155): grouping Stock by its sharding
key costs 2.8349 vs 25.1867 unsharded (~8.9x) because the aligned layout
avoids the shuffle entirely (`query_simulator/aggregate.py:218-236`); Q7
groups the fact table on a non-key (`date`) and pays the full
groups x shards x partial-size network cost.

Here: lineitem bucketed by l_orderkey vs plain parquet, aggregated by
l_orderkey (aligned — no Exchange) and by l_shipdate's day (unaligned —
full shuffle), with measured shuffle bytes priced by the same 5x network
multiplier.  The *ordering* (aligned << unaligned) is the reproduced claim;
absolute ratios depend on data shape.

Run:  python -m bigdatastructure_a5_spark.examples.sharding_demo [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.plans.metrics import run_with_metrics
from bigdatastructure_a5_spark.session import get_spark


def run(spark, sf_dir: str) -> dict[str, object]:
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS sharded_lineitem")
    # DROP only clears this session's in-memory catalog; a previous run's
    # managed-table directory would still block saveAsTable — remove it.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/sharded_lineitem", ignore_errors=True)
    (
        li.write.mode("overwrite")
        .format("parquet")
        .bucketBy(16, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("sharded_lineitem")
    )
    sharded = spark.table("sharded_lineitem")

    def agg_by_key(df):
        return df.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )

    def agg_by_date(df):
        return df.groupBy(F.to_date("l_shipdate").alias("d")).agg(
            F.count(F.lit(1)).alias("n")
        )

    results = {
        "q6_sharded": run_with_metrics(spark, agg_by_key(sharded), "q6_sharded"),
        "q6_unsharded": run_with_metrics(spark, agg_by_key(li), "q6_unsharded"),
        "q7_unaligned": run_with_metrics(spark, agg_by_date(sharded), "q7_unaligned"),
    }
    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sharding-demo")
    spark.sparkContext.setLogLevel("ERROR")
    results = run(spark, sf_dir)
    print(f"{'case':<14} {'shuffleMiB':>10} {'time-cost':>12}  (reference: 2.8349 sharded vs 25.1867 unsharded, REPORT.md:153-154)")
    for name, qm in results.items():
        print(
            f"{name:<14} {qm.shuffle_bytes / 2**20:>10.3f} {qm.costs()['time']:>12.6f}"
        )
    assert (
        results["q6_sharded"].shuffle_bytes < results["q6_unsharded"].shuffle_bytes
    ), "bucketed aggregation must shuffle less"


if __name__ == "__main__":
    main()

"""The reference's final challenge, executed for real.

Reference setup (`/root/reference/challenge/denormalizations.json:2-62`,
`challenge/queries.json:2-13`): Product/OrderLine with four candidate
layouts — D1 normalized, D2 OrderLine embeds Product (one), D3 Product embeds
orderLines (many), D4 = D3 plus standalone OrderLine — under a workload of a
hot brand filter (freq 1000) and a filtered join (freq 100), ranked by
(price, carbon, time).

Mapped onto the driver fixtures (FIXTURES.md §5): Product->part,
OrderLine->lineitem.  Where the reference *estimates* scanned/shuffled GB
from stats formulas, this demo measures them from executed Spark plans and
prices them with the same constants.

Run:  python -m bigdatastructure_a5_spark.examples.challenge_demo [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

from bigdatastructure_a5_spark.catalog import load_tables
from bigdatastructure_a5_spark.operators.denormalize import (
    CollectionSpec,
    DenormalizationSpec,
    EmbedSpec,
)
from bigdatastructure_a5_spark.plans.workload import run_workload
from bigdatastructure_a5_spark.session import get_spark
from bigdatastructure_a5_spark.sources.json_config import QuerySpec

EMBED_PART_INTO_LINEITEM = EmbedSpec(
    source="part",
    target="lineitem",
    path="product",
    cardinality="one",
    target_key="l_partkey",
    source_key="p_partkey",
    fields=("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
)
EMBED_LINEITEMS_INTO_PART = EmbedSpec(
    source="lineitem",
    target="part",
    path="order_lines",
    cardinality="many",
    target_key="p_partkey",
    source_key="l_partkey",
    fields=("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
)

DENORMS = [
    DenormalizationSpec(
        id="D1",
        description="normalized Product+OrderLine (reference D1)",
        collections=(
            CollectionSpec("part", sharding_key="p_partkey", indexes=("p_brand",)),
            CollectionSpec("lineitem", sharding_key="l_orderkey"),
        ),
    ),
    DenormalizationSpec(
        id="D2",
        description="OrderLine embeds Product (one-embed; reference D2)",
        collections=(CollectionSpec("lineitem", sharding_key="l_orderkey"),),
        embeds=(EMBED_PART_INTO_LINEITEM,),
    ),
    DenormalizationSpec(
        id="D3",
        description="Product embeds orderLines[] (many-embed; reference D3)",
        collections=(CollectionSpec("part", sharding_key="p_partkey"),),
        embeds=(EMBED_LINEITEMS_INTO_PART,),
    ),
    DenormalizationSpec(
        id="D4",
        description="D3 plus standalone OrderLine kept (reference D4)",
        collections=(
            CollectionSpec("part", sharding_key="p_partkey"),
            CollectionSpec("lineitem", sharding_key="l_orderkey"),
        ),
        embeds=(EMBED_LINEITEMS_INTO_PART,),
    ),
]

WORKLOAD = [
    QuerySpec(
        id="q1_brand_filter",
        sql="SELECT p.p_name, p.p_brand FROM part p WHERE p.p_brand = 'Brand#12'",
        frequency=1000,
    ),
    QuerySpec(
        id="q2_filtered_join",
        sql=(
            "SELECT l.l_orderkey, l.l_quantity FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_brand = 'Brand#12'"
        ),
        frequency=100,
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "out/challenge"
    spark = get_spark("challenge-demo")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_tables(spark, sf_dir, ("part", "lineitem"))
    with tempfile.TemporaryDirectory(prefix="variants_") as storage:
        report = run_workload(spark, base, DENORMS, WORKLOAD, storage, out_dir)
    print(report.to_text())
    print(f"\nwrote results.csv / leaderboard.md / report.json -> {out_dir}")


if __name__ == "__main__":
    main()

"""Denormalization parity queries (O14/O15/O22).

Each builds a variant layout *in the query* from the base fixtures (the
workbench's `build_variant`), runs the routed/embedded form, and returns a
flat result whose oracle is the equivalent *normalized join* — proving the
denormalized layout answers the same question (the reference's central claim,
`challenge/planner.py:168-222`: an embed-covered join collapses to a filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.functions.numeric import dec_sum_double
from bigdatastructure_a5_spark.operators.denormalize import (
    CollectionSpec,
    DenormalizationSpec,
    EmbedSpec,
    build_variant,
    routed_filter,
)
from bigdatastructure_a5_spark.registry import query

#: D2 analogue (reference challenge/denormalizations.json): the fact table
#: (lineitem<-OrderLine) embeds its dimension (part<-Product) as a struct.
D2_LINEITEM_EMBEDS_PART = DenormalizationSpec(
    id="D2",
    description="lineitem embeds part as struct 'product' (one-embed)",
    collections=(CollectionSpec("lineitem", sharding_key="l_orderkey"),),
    embeds=(
        EmbedSpec(
            source="part",
            target="lineitem",
            path="product",
            cardinality="one",
            target_key="l_partkey",
            source_key="p_partkey",
            fields=("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        ),
    ),
)

#: D3 analogue: the dimension embeds its fact rows as an array (many-embed).
D3_PART_EMBEDS_LINEITEMS = DenormalizationSpec(
    id="D3",
    description="part embeds its lineitems as array 'lines' (many-embed)",
    collections=(CollectionSpec("part", sharding_key="p_partkey"),),
    embeds=(
        EmbedSpec(
            source="lineitem",
            target="part",
            path="lines",
            cardinality="many",
            target_key="p_partkey",
            source_key="l_partkey",
            fields=("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
        ),
    ),
)


@query(
    "denorm_join_elimination",
    oracle="""
    SELECT p_type,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
    GROUP BY p_type
    """,
    tags=("O14", "O22"),
)
def denorm_join_elimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query the D2 variant: the part-filter + join becomes ONE filter on the
    embedding host with a `product.p_brand` nested predicate (O14); the
    oracle is the normalized join — results must be identical."""
    base = {
        "lineitem": load_table(spark, sf_dir, "lineitem"),
        "part": load_table(spark, sf_dir, "part"),
    }
    variant = build_variant(base, D2_LINEITEM_EMBEDS_PART)
    # 'part' is absent from the layout -> routed to host with path-prefixed
    # predicate (O15 collection substitution).
    filtered = routed_filter(
        variant, D2_LINEITEM_EMBEDS_PART, "part", {"p_brand": "Brand#23"}
    )
    return filtered.groupBy(F.col("product.p_type").alias("p_type")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dec_sum_double("l_quantity").alias("sum_qty"),
    )


@query(
    "denorm_many_embed",
    oracle="""
    SELECT p_partkey, p_brand,
           COUNT(l_orderkey) AS n_embedded,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS embedded_qty
    FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
    GROUP BY p_partkey, p_brand
    """,
    tags=("O22",),
)
def denorm_many_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the D3 many-embed variant and read per-part facts straight out of
    the embedded array (no join at query time): array size and an exact
    decimal fold over the embedded quantities."""
    base = {
        "part": load_table(spark, sf_dir, "part"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
    }
    variant = build_variant(base, D3_PART_EMBEDS_LINEITEMS)
    part_v = variant["part"]
    # keep the accumulator type fixed: decimal addition widens (18,2)+(18,2)
    # -> (19,2), so cast the fold result back each step (values stay exact).
    qty_sum = F.aggregate(
        F.col("lines"),
        F.lit(0).cast("decimal(18,2)"),
        lambda acc, x: (acc + x["l_quantity"].cast("decimal(18,2)")).cast(
            "decimal(18,2)"
        ),
    )
    return part_v.select(
        "p_partkey",
        "p_brand",
        F.size("lines").cast("bigint").alias("n_embedded"),
        # SUM over zero rows is NULL in SQL; empty array folds to 0 -> align.
        F.when(F.size("lines") > 0, qty_sum.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("embedded_qty"),
    )

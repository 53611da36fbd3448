"""SURVEY.md §2 parity queries (O1-O20 + §2.6 engine extensions).

Each query is the executable analogue of a reference operator, mapped onto
the driver's TPC-H-ish fixtures per FIXTURES.md §5 (Product->part,
OrderLine->lineitem, Client->customer, Movie/Review analogues likewise).
Oracle SQL strings use identical aliases and deterministic numerics
(registry.py docstring) so the DuckDB hash gate passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.functions.numeric import dec_sum_double, det_avg
from bigdatastructure_a5_spark.operators.aggregates import group_agg
from bigdatastructure_a5_spark.operators.filters import eq_filter, project
from bigdatastructure_a5_spark.operators.joins import dim_join, equi_join
from bigdatastructure_a5_spark.registry import query


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


#: exact per-row revenue: decimal(18,2) price x (1 - decimal(18,2) discount)
def _revenue_dec() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# O1/O5/O6 — conjunctive equality filter + projection
# (reference challenge/planner.py:29-49, challenge/simulator.py:42-67)
# ---------------------------------------------------------------------------
@query(
    "filter_eq_conjunctive",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand = 'Brand#12' AND p_type = 'PROMO'
    """,
    tags=("O1", "O5", "O6"),
)
def filter_eq_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2_brand_filter analogue: WHERE brand = X AND type = Y, projected."""
    part = load_table(spark, sf_dir, "part")
    out = eq_filter(part, {"p_brand": "Brand#12", "p_type": "PROMO"})
    return project(out, ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])


# NOTE (r9 registry rotation): the former ``filter_date_point`` query
# (Q3_orders_by_date analogue: point date filter over lineitem) was
# rotated out of the 50-slot registry for the quantization/layout gate
# queries (queries/quant_queries.py) — O1 point-filter semantics stay
# gated via filter_eq_conjunctive, date typing via agg_prefiltered's
# YEAR/MONTH predicates and the shard-targeted scan's pruning plan test.


# ---------------------------------------------------------------------------
# O5 — projection with a computed column (per-row double math is IEEE-stable)
# ---------------------------------------------------------------------------
@query(
    "projection_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
    tags=("O5",),
)
def projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection: the parquet scan should read exactly 4
    columns (check ReadSchema in the plan) — impossible in the reference's
    row-store model where projection never reduces scan cost."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# O8 — plain inner equi-join (reference challenge/planner.py:52-112)
# ---------------------------------------------------------------------------
@query(
    "join_equi_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("O8", "O9"),
)
def join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x customer; Catalyst picks broadcast vs sort-merge (O9 is its
    cost model)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
    return j.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# O11 — filter-then-join, dimension side broadcast
# (Q4_brand_stock_join analogue, reference query_simulator/queries.py:64-87)
# ---------------------------------------------------------------------------
@query(
    "join_filtered_brand",
    oracle="""
    SELECT p_type,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
    GROUP BY p_type
    """,
    tags=("O11", "O9"),
)
def join_filtered_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter the dimension, broadcast it into the fact scan: at 100 TB the
    lineitem side never shuffles for a sub-MB filtered dim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    j = dim_join(li.withColumnRenamed("l_partkey", "p_partkey"), part, on="p_partkey")
    return j.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dec_sum_double("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# O13 — multi-way filtered join
# (Q5_orders_brand_client_join analogue, query_simulator/queries.py:89-123)
# ---------------------------------------------------------------------------
@query(
    "join_three_way",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(*) AS n_lines,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND YEAR(CAST(l_shipdate AS DATE)) = 2000
    GROUP BY c_custkey, c_name
    """,
    tags=("O13",),
)
def join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join, fact-first with filters pushed to both inputs; the
    customer dimension broadcasts."""
    # YEAR(CAST(ts AS DATE)) = 2000 as a raw-column range so it reaches
    # the parquet scan (PushedFilters + row-group stats skipping); the
    # function-wrapped form is unpushable and scanned every row group
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner").join(
        F.broadcast(cust), F.col("o_custkey") == cust.c_custkey, "inner"
    )
    return j.groupBy("c_custkey", "c_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_revenue_dec()).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# O16/O19 — full group-by aggregate (TPC-H Q1 shape; the reference's
# map/shuffle/reduce model query_simulator/aggregate.py:166-274, executed for
# real as partial HashAggregate -> Exchange -> final HashAggregate)
# ---------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("O16", "O19"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sums/averages/counts with exact (order-independent) numerics."""
    return pricing_summary_over(load_table(spark, sf_dir, "lineitem"))


def pricing_summary_over(li: DataFrame) -> DataFrame:
    """The agg_pricing_summary aggregation body over an arbitrary lineitem
    frame — shared with the ORC-twin connector test so the twin can't drift
    from the registry query it claims to mirror."""
    return group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            dec_sum_double("l_quantity").alias("sum_qty"),
            dec_sum_double("l_extendedprice").alias("sum_base_price"),
            F.sum(_revenue_dec()).cast("double").alias("sum_disc_price"),
            det_avg("l_quantity").alias("avg_qty"),
            det_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )


# ---------------------------------------------------------------------------
# O20 — pre-aggregation filter (query_simulator/aggregate.py:24-33)
# ---------------------------------------------------------------------------
@query(
    "agg_prefiltered",
    oracle="""
    SELECT l_partkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE YEAR(CAST(l_shipdate AS DATE)) = 2000
      AND MONTH(CAST(l_shipdate AS DATE)) = 4
    GROUP BY l_partkey
    """,
    tags=("O20",),
)
def agg_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-style pre-filter, then group: the filter reaches the parquet
    scan (PushedFilters), shrinking the shuffle the reference prices at
    groups x shards x partial_size."""
    li = load_table(spark, sf_dir, "lineitem")
    # YEAR = 2000 AND MONTH = 4 ⟺ ts in [2000-04-01, 2000-05-01) on the
    # RAW column — pushable to the parquet scan, unlike the oracle's
    # function-wrapped spelling, which Spark cannot push and which left
    # this "pre-filter reaches the scan" row scanning every row group
    return group_agg(
        li,
        ["l_partkey"],
        [
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum_double("l_quantity").alias("sum_qty"),
        ],
        pre_filter=(
            (F.col("l_shipdate") >= F.lit("2000-04-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("2000-05-01").cast("timestamp_ntz"))
        ),
    )


# ---------------------------------------------------------------------------
# O17 — aggregation on the natural co-partition key (shuffle-minimal path)
# ---------------------------------------------------------------------------
@query(
    "agg_on_orderkey",
    oracle=f"""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS order_revenue
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("O17", "O16"),
)
def agg_on_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group on l_orderkey: on a layout bucketed by orderkey this runs with NO
    Exchange (the reference's shuffle-free sharded aggregation,
    query_simulator/aggregate.py:218-236); tests assert the bucketed plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return group_agg(
        li,
        ["l_orderkey"],
        [
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_revenue_dec()).cast("double").alias("order_revenue"),
        ],
    )


# ---------------------------------------------------------------------------
# O12 — join after aggregate (chapter5 Q5_top_movies_with_titles,
# chapter5/planner.py:58-77) — THE FLAGSHIP (entry()) QUERY
# ---------------------------------------------------------------------------
@query(
    "agg_then_join",
    oracle="""
    SELECT p_partkey, p_brand, n_lines, avg_price
    FROM (
      SELECT l_partkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_extendedprice) AS avg_price
      FROM lineitem GROUP BY l_partkey
    ) agg
    JOIN part ON l_partkey = p_partkey
    """,
    tags=("O12",),
)
def agg_then_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg price per part (Review.avg(rating) analogue) joined back to the
    part dimension; the aggregated side is |parts|-sized -> broadcast-able."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        det_avg("l_extendedprice").alias("avg_price"),
    )
    j = agg.join(F.broadcast(part), agg.l_partkey == part.p_partkey, "inner")
    return j.select("p_partkey", "p_brand", "n_lines", "avg_price")


# ---------------------------------------------------------------------------
# §2.6 engine extensions the reference lacks (sorts/limits, set ops, windows,
# scalar functions) — free in Spark, registered so coverage is checkable.
# ---------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("ext:sort",),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a UNIQUE total order (o_orderkey tiebreak) so the selected
    set is deterministic; Spark executes as TakeOrderedAndProject (no full
    sort of 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_operations",
    oracle="""
    SELECT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_nationkey = 3
    ) t
    """,
    tags=("ext:setops",),
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT then EXCEPT, matching parenthesization on both engines."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    d = c.filter(F.col("c_nationkey") == 3).select("c_custkey")
    return a.union(b).distinct().subtract(d)


WINDOW_TOPN_ORACLE = """
    SELECT c_nationkey, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    ) t
    WHERE rn <= 3
    """


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance (unique order -> deterministic).
    At scale: single hash-partition by the window key, no global sort.
    Rotated out of the driver registry in r10 (slot went to
    dedup_clusters); stays engine-vs-oracle checked in tests/test_tools.py,
    and window machinery stays driver-gated via events_sessionize (lag
    window), events_sliding_window, and curriculum_bins (ntile window)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


SCALAR_FUNCTIONS_ORACLE = """
    SELECT o_orderkey,
           LOWER(o_orderstatus) AS status_lower,
           CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_num,
           CONCAT(UPPER(o_orderstatus), '-', SUBSTRING(o_orderpriority, 1, 1)) AS status_code,
           YEAR(CAST(o_orderdate AS DATE))  AS order_year,
           MONTH(CAST(o_orderdate AS DATE)) AS order_month,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions (absent from the reference, whose
    only value semantics is literal equality — SURVEY.md §2.6).  Rotated
    out of the driver registry in r10 (slot went to the mixture/packing
    family); stays engine-vs-oracle checked in tests/test_tools.py, and
    scalar expressions stay driver-gated via events_json_extract +
    projection_computed."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.lower("o_orderstatus").alias("status_lower"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.concat(
            F.upper("o_orderstatus"), F.lit("-"), F.substring("o_orderpriority", 1, 1)
        ).alias("status_code"),
        F.year(d).cast("bigint").alias("order_year"),
        F.month(d).cast("bigint").alias("order_month"),
        F.floor("o_totalprice").cast("bigint").alias("total_floor"),
        F.date_add(d, 30).alias("due_date"),
    )


COMPOSITE_SHIPPING_ORACLE = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """


def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped composite — every §2 operator family in ONE plan:
    conjunctive filters on three tables (O1), filter-then-join (O11),
    3-way join with the customer dimension broadcast (O13), grouped
    decimal-exact aggregation (O16/O19), and a unique-total-order top-k
    that compiles to TakeOrderedAndProject.  Pins that Catalyst composes
    the per-operator guarantees (pushdown below the joins, partial
    aggregation, no global sort) when everything appears at once.

    Revenue is computed per-row in double (one IEEE multiply, identical
    cross-engine) then summed exactly as decimal — the numeric.py rule.

    Rotated out of the driver registry in r10 (slot went to the
    mixture/packing family); stays engine-vs-oracle checked in
    tests/test_tools.py.  Every component family keeps its own driver
    row: O1 filter_eq_conjunctive, O11 join_filtered_brand, O13
    join_three_way, O16/O19 agg_pricing_summary, top-k sort_limit_topk."""
    cutoff = "1997-01-01"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


#: Engine-vs-oracle twin for the rotated-out agg_salted_skew (r13) —
#: consumed by tests/test_tools.py::test_agg_salted_skew_matches_duckdb.
AGG_SALTED_SKEW_ORACLE = """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_l_quantity,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_l_extendedprice
    FROM lineitem
    GROUP BY l_returnflag
    """


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.salted_agg) on a
    3-group key — the worst reduce-side skew shape: 600k rows land on 3
    reducers unsalted.  Salting spreads each group over 16 sub-keys before
    the final combine; the result is EXACTLY the plain GROUP BY (decimal
    sums are associative), which the oracle hash-checks.  AQE splits skewed
    joins but not aggregations — this is the aggregation-side tool.

    Rotated OUT of the driver registry in r13 (slot balance for
    ``dedup_retraction``; the registry is pinned at the driver's 50-row
    snapshot size — VERDICT r12 item 1): skew salting stays driver-gated
    via ``join_salted_skew`` (the same operators/skew.py module and the
    same result-invariance contract), the aggregation side keeps its
    engine-vs-DuckDB twin in
    tests/test_tools.py::test_agg_salted_skew_matches_duckdb, and the
    AQE-vs-manual-salting trade stays measured in EXPERIMENTS §10."""
    from bigdatastructure_a5_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li, ["l_returnflag"], ["l_quantity", "l_extendedprice"], salt=16
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT l_orderkey, l_partkey, p_brand, l_quantity
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size = 25
    """,
    tags=("ext:skew",),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dimension join (operators/skew.salted_join): the fact
    side spreads over 16 sub-keys, the filtered dimension replicates x16 —
    the manual fallback for skew so extreme that even AQE's split
    partitions overwhelm a task.  Salting must be result-invariant: the
    oracle hash-checks it against the plain join."""
    from bigdatastructure_a5_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    out = salted_join(li, part, key="p_partkey", salt=16)
    return out.select(
        "l_orderkey",
        F.col("p_partkey").alias("l_partkey"),
        "p_brand",
        "l_quantity",
    )

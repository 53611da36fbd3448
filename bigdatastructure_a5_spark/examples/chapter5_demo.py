"""The reference's chapter-5 Movie/Review workload, executed for real.

Reference setup (`/root/reference/data/chapter5/`): Movie (1e5), Review
(1e7), User (1e6) under DB1 (normalized) vs DB2 (Review embeds
movieTitle/movieGenre — `schemas/DB2.json:12-24`), with a 5-query workload
at frequencies 5/10/2/1/1 (`queries.json:3-29`) covering filter, point
lookup, join, aggregate, and join-after-aggregate
(`chapter5/planner.py:8-77`).  The reference's simulated verdict
(REPORT.md:157-173, BASELINE.md): DB1 wins — embedding the movie fields
into every review inflates the review scans that dominate this workload.

Here the same experiment runs on real data (FIXTURES.md mapping:
Movie->part, Review->lineitem, User->customer, with columns renamed to the
reference's logical schema), measured with real scan/shuffle bytes and
priced with the reference's constants.

Run:  python -m bigdatastructure_a5_spark.examples.chapter5_demo [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.operators.denormalize import (
    CollectionSpec,
    DenormalizationSpec,
    EmbedSpec,
)
from bigdatastructure_a5_spark.plans.workload import run_workload
from bigdatastructure_a5_spark.session import get_spark
from bigdatastructure_a5_spark.sources.json_config import QuerySpec


def movie_base_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Derive the Movie/Review/User logical schema from the fixtures."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    movie = part.select(
        F.col("p_partkey").alias("movieId"),
        F.col("p_name").alias("title"),
        F.col("p_type").alias("genre"),
    )
    # reviewId must actually be a KEY (Review's pk in the modeled schema);
    # the fixture's (l_orderkey, l_linenumber) pairs are NOT unique, so a
    # derivation from them collides — row_number over a deterministic
    # ordering guarantees uniqueness (single-partition window: fine for an
    # experiment corpus, not a pattern for the 100 TB path)
    from pyspark.sql import Window

    rid = F.row_number().over(
        Window.orderBy(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
        )
    )
    review = li.select(
        rid.cast("bigint").alias("reviewId"),
        F.col("l_partkey").alias("movieId"),
        F.col("l_suppkey").alias("userId"),
        (F.pmod(F.col("l_quantity").cast("bigint"), F.lit(5)) + 1).alias("rating"),
    )
    user = cust.select(
        F.col("c_custkey").alias("userId"),
        F.col("c_nationkey").cast("string").alias("country"),
    )
    return {"movie": movie, "review": review, "user": user}


DB1 = DenormalizationSpec(
    id="DB1",
    description="normalized Movie/Review/User (reference DB1)",
    collections=(
        CollectionSpec("movie", sharding_key="movieId"),
        CollectionSpec("review", sharding_key="movieId"),
        CollectionSpec("user", sharding_key="userId"),
    ),
)

DB2 = DenormalizationSpec(
    id="DB2",
    description="Review embeds movie title+genre (reference DB2)",
    collections=(
        CollectionSpec("movie", sharding_key="movieId"),
        CollectionSpec("review", sharding_key="movieId"),
        CollectionSpec("user", sharding_key="userId"),
    ),
    embeds=(
        EmbedSpec(
            source="movie",
            target="review",
            path="movie",
            cardinality="one",
            target_key="movieId",
            source_key="movieId",
            fields=("title", "genre"),
        ),
    ),
)

#: the reference's five queries (chapter5/planner.py:8-77) as SQL, at the
#: reference's frequencies (data/chapter5/queries.json:3-29)
WORKLOAD = [
    QuerySpec(
        id="Q1_movies_by_genre",
        sql="SELECT m.title FROM movie m WHERE m.genre = 'PROMO'",
        frequency=5,
    ),
    QuerySpec(
        id="Q2_reviews_for_movie",
        sql="SELECT r.reviewId, r.rating FROM review r WHERE r.movieId = 42",
        frequency=10,
    ),
    QuerySpec(
        id="Q3_movie_review_join",
        sql=(
            "SELECT m.title, r.rating FROM review r "
            "JOIN movie m ON r.movieId = m.movieId "
            "WHERE m.genre = 'PROMO'"
        ),
        frequency=2,
    ),
    QuerySpec(
        id="Q4_avg_rating_by_movie",
        sql=(
            "SELECT movieId, CAST(SUM(CAST(rating AS DECIMAL(18,2))) AS DOUBLE)"
            " / COUNT(rating) AS avg_rating, COUNT(*) AS n_reviews "
            "FROM review GROUP BY movieId"
        ),
        frequency=1,
    ),
    QuerySpec(
        id="Q5_top_movies_with_titles",
        sql=(
            "SELECT m.title, a.avg_rating FROM ("
            "  SELECT movieId, CAST(SUM(CAST(rating AS DECIMAL(18,2))) AS DOUBLE)"
            "  / COUNT(rating) AS avg_rating FROM review GROUP BY movieId"
            ") a JOIN movie m ON a.movieId = m.movieId"
        ),
        frequency=1,
    ),
]


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_dir = argv[1] if len(argv) > 1 else "out/chapter5"
    spark = get_spark("chapter5-demo")
    spark.sparkContext.setLogLevel("ERROR")
    base = movie_base_tables(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="movie_variants_") as storage:
        report = run_workload(spark, base, [DB1, DB2], WORKLOAD, storage, out_dir)
    print(report.to_text())
    lb = report.leaderboard()
    print(
        f"\nwinner: {lb[0][0]} (reference's simulated winner: DB1, REPORT.md:173)"
    )


if __name__ == "__main__":
    main()

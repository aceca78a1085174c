"""The reference's declared query layer over the Netflix star schema.

Every view and analytical query the reference's warehouse DDL/README
declares, as named DataFrame builders (SURVEY.md §2.4-2.6):

- v_daily_rating_summary    schema.sql:131-144
- v_movie_performance       schema.sql:149-160
- top_10_most_rated         README.md:450-454
- top_rated_min_ratings     schema.sql:198-210 (HAVING >= 100)
- rating_trend_by_year      schema.sql:214-224
- most_active_customers     schema.sql:229-237 (datediff span, top-20)
- orphaned_ratings          schema.sql:188-191 (integrity anti-join)
- row_count_verification    schema.sql:179-185 (UNION ALL counts)
- warehouse_summary         etl_pipeline_spark.py:1457-1502

All are pure DataFrame composition over (fact_ratings, dim_date,
dim_movie, dim_customer); dimension joins broadcast (dims are small
relative to the fact at any scale); AVG is rounded to 2 like the
reference's ROUND(x::numeric, 2) (schema.sql:204).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def v_daily_rating_summary(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """Per-day totals (schema.sql:131-144)."""
    return (
        fact.join(F.broadcast(dim_date.select("date_key", "date_actual")), "date_key")
        .groupBy("date_actual")
        .agg(
            F.count("*").alias("total_ratings"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
            F.countDistinct("customer_key").alias("unique_customers"),
            F.countDistinct("movie_key").alias("unique_movies"),
        )
        .orderBy("date_actual")
    )


def v_movie_performance(fact: DataFrame, dim_movie: DataFrame) -> DataFrame:
    """Per-movie totals (schema.sql:149-160)."""
    return (
        fact.join(
            F.broadcast(
                dim_movie.select("movie_key", "movie_id", "title", "release_year")
            ),
            "movie_key",
        )
        .groupBy("movie_id", "title", "release_year")
        .agg(
            F.count("*").alias("total_ratings"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
            F.countDistinct("customer_key").alias("unique_customers"),
        )
        .orderBy(F.col("total_ratings").desc(), F.col("movie_id").asc())
    )


def top_10_most_rated(fact: DataFrame, dim_movie: DataFrame) -> DataFrame:
    """Top-10 most-rated movies (README.md:450-454)."""
    return (
        fact.join(F.broadcast(dim_movie.select("movie_key", "movie_id", "title")), "movie_key")
        .groupBy("movie_id", "title")
        .agg(
            F.count("*").alias("rating_count"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
        )
        .orderBy(F.col("rating_count").desc(), F.col("movie_id").asc())
        .limit(10)
    )


def top_rated_min_ratings(
    fact: DataFrame, dim_movie: DataFrame, min_ratings: int = 100
) -> DataFrame:
    """Top-10 highest-rated with HAVING count >= K (schema.sql:198-210)."""
    return (
        fact.join(F.broadcast(dim_movie.select("movie_key", "movie_id", "title")), "movie_key")
        .groupBy("movie_id", "title")
        .agg(
            F.count("*").alias("rating_count"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
        )
        .filter(F.col("rating_count") >= min_ratings)
        .orderBy(
            F.col("avg_rating").desc(),
            F.col("rating_count").desc(),
            F.col("movie_id").asc(),
        )
        .limit(10)
    )


def rating_trend_by_year(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """Per-year counts/avg/distincts (schema.sql:214-224)."""
    # project fact first: the stored fact may carry a `year` partition
    # column that would collide with dim_date.year
    return (
        fact.select("date_key", "rating", "customer_key", "movie_key")
        .join(F.broadcast(dim_date.select("date_key", "year")), "date_key")
        .groupBy("year")
        .agg(
            F.count("*").alias("total_ratings"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
            F.countDistinct("customer_key").alias("unique_customers"),
            F.countDistinct("movie_key").alias("unique_movies"),
        )
        .orderBy("year")
    )


def most_active_customers(
    fact: DataFrame, dim_customer: DataFrame, limit: int = 20
) -> DataFrame:
    """Top-K customers by volume + activity span in days (schema.sql:229-237)."""
    return (
        fact.join(
            F.broadcast(dim_customer.select("customer_key", "customer_id")),
            "customer_key",
        )
        .groupBy("customer_id")
        .agg(
            F.count("*").alias("total_ratings"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
            F.min(F.to_date("rating_timestamp")).alias("first_rating_date"),
            F.max(F.to_date("rating_timestamp")).alias("last_rating_date"),
        )
        .withColumn(
            "active_days",
            F.datediff("last_rating_date", "first_rating_date").cast("int"),
        )
        .orderBy(F.col("total_ratings").desc(), F.col("customer_id").asc())
        .limit(limit)
    )


def orphaned_ratings(fact: DataFrame, dim_customer: DataFrame) -> DataFrame:
    """Integrity: fact rows with no customer (schema.sql:188-191) — must be 0."""
    return fact.join(
        dim_customer.select("customer_key"), "customer_key", "left_anti"
    )


def row_count_verification(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-table row counts via UNION ALL (schema.sql:179-185)."""
    frames = [
        df.agg(F.lit(name).alias("table_name"), F.count("*").alias("row_count"))
        for name, df in tables.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name")


def warehouse_summary(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """Global stats (reference load_summary etl_pipeline_spark.py:1457-1502)."""
    return fact.join(
        F.broadcast(dim_date.select("date_key", "date_actual")), "date_key"
    ).agg(
        F.count("*").alias("total_ratings"),
        F.min("date_actual").alias("first_date"),
        F.max("date_actual").alias("last_date"),
        F.round(F.avg("rating"), 2).alias("avg_rating"),
    )

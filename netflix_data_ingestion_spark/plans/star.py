"""Star-schema builders: dim_date, dim_movie, dim_customer, fact_ratings.

Spark-first reimplementation of the reference's dimension/fact loaders
(etl_pipeline_spark.py:741-1502) with the driver funnels removed:

- surrogate keys are deterministic Spark ranks, not DB SERIAL readbacks
  (SURVEY.md §7.2.3);
- fact assembly stays distributed end-to-end (the reference funnels every
  fact partition through toPandas() + psycopg2 COPY, :1181-1330);
- customer aggregates are a recompute-and-overwrite join, not a driver
  collect + batched UPDATE (:1370-1455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.functions.datetime import with_date_dim_columns
from netflix_data_ingestion_spark.operators.keys import surrogate_key_small
from netflix_data_ingestion_spark.schemas import validate

# the reference's configured calendar range (etl_pipeline_spark.py:172)
DEFAULT_DATE_RANGE = ("1998-10-01", "2005-12-31")


def build_dim_date(
    spark: SparkSession,
    start: str = DEFAULT_DATE_RANGE[0],
    end: str = DEFAULT_DATE_RANGE[1],
) -> DataFrame:
    """Synthetic consecutive calendar (reference etl_pipeline_spark.py:757-811).

    ``sequence + explode`` generates the range; all derived columns are
    built-in expressions (functions/datetime.py).  For the reference range
    this yields exactly 2,649 rows (BASELINE.md caveat).
    """
    dates = spark.sql(
        f"""
        SELECT explode(sequence(to_date('{start}'), to_date('{end}'),
                                interval 1 day)) AS date_actual
        """
    )
    df = with_date_dim_columns(dates, "date_actual")
    valid, _ = validate(df, "dim_date")
    return valid.select(
        "date_key",
        "date_actual",
        "year",
        "month",
        "day",
        "quarter",
        "day_of_week",
        "month_name",
        "is_weekend",
    )


def build_dim_movie(movies: DataFrame) -> DataFrame:
    """(movie_id, title, release_year) → + deterministic movie_key.

    Replaces the SERIAL key + driver readback at reference
    etl_pipeline_spark.py:914-937.  Invalid release years are kept as NULL
    rather than dropped (DDL allows NULL, schema.sql:57).
    """
    cleaned = movies.withColumn(
        "release_year",
        F.when(
            F.col("release_year").between(1890, 2010), F.col("release_year")
        ).cast("smallint"),
    )
    keyed = surrogate_key_small(cleaned, ["movie_id"], "movie_key")
    return keyed.select("movie_key", "movie_id", "title", "release_year")


def build_dim_customer(ratings: DataFrame) -> DataFrame:
    """Distinct customers across all rating inputs → deterministic keys.

    The reference unions per-file id extractions then distincts
    (etl_pipeline_spark.py:963-999); here the parsed ratings frame is the
    union already, so this is a single distinct + rank.  Aggregate columns
    (first/last rating date, total) are attached later by
    ``with_customer_aggregates``.
    """
    distinct_ids = ratings.select("customer_id").distinct()
    keyed = surrogate_key_small(distinct_ids, ["customer_id"], "customer_key")
    return keyed.select("customer_key", "customer_id")


def build_fact_ratings(
    ratings: DataFrame,
    dim_movie: DataFrame,
    dim_customer: DataFrame,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Assemble fact_ratings (reference etl_pipeline_spark.py:1144-1179).

    Key-mapping joins are left joins against the (small) dimension
    mappings — Catalyst auto-broadcasts them; rows whose keys fail the
    lookup are dropped WITH ACCOUNTING (the reference logs the delta at
    :1163-1172), returned here as the ``dropped`` frame so callers can
    count/inspect without forcing an action.

    Returns (fact, {"dropped": unresolved_rows}).
    """
    enriched = (
        ratings.join(
            F.broadcast(dim_customer.select("customer_id", "customer_key")),
            "customer_id",
            "left",
        )
        .join(
            F.broadcast(dim_movie.select("movie_id", "movie_key")),
            "movie_id",
            "left",
        )
        .withColumn("rating_date", F.try_to_date("date_str", "yyyy-MM-dd"))
        .withColumn(
            "date_key", F.date_format("rating_date", "yyyyMMdd").cast("int")
        )
        .withColumn("rating_timestamp", F.col("rating_date").cast("timestamp"))
    )

    resolved = (
        F.col("customer_key").isNotNull()
        & F.col("movie_key").isNotNull()
        & F.col("date_key").isNotNull()
    )
    fact = enriched.filter(resolved).select(
        "customer_key",
        "movie_key",
        "date_key",
        F.col("rating").cast("smallint").alias("rating"),
        "rating_timestamp",
    )
    valid, invalid = validate(fact, "fact_ratings")
    dropped = enriched.filter(~resolved)
    return valid, {"dropped": dropped, "check_failed": invalid}


def with_customer_aggregates(
    dim_customer: DataFrame, fact: DataFrame, dim_date: DataFrame
) -> DataFrame:
    """Back-fill first/last rating date + total per customer.

    Replaces the reference's driver-side collect + psycopg2 batched UPDATE
    (etl_pipeline_spark.py:1370-1455) with a recompute-and-overwrite join:
    fact ⋈ dim_date on date_key (partial aggregation is map-side; the
    join is broadcast since dim_date is 2,649 rows).
    """
    per_customer = (
        fact.join(F.broadcast(dim_date.select("date_key", "date_actual")), "date_key")
        .groupBy("customer_key")
        .agg(
            F.min("date_actual").alias("first_rating_date"),
            F.max("date_actual").alias("last_rating_date"),
            F.count("*").alias("total_ratings"),
        )
    )
    return dim_customer.join(per_customer, "customer_key", "left").select(
        "customer_key",
        "customer_id",
        "first_rating_date",
        "last_rating_date",
        "total_ratings",
    )

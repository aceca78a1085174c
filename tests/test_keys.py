"""Deterministic surrogate keys (SURVEY.md §7.2.3)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.keys import (
    surrogate_key_ranged,
    surrogate_key_small,
)


def test_small_keys_are_rank_of_natural_key(spark):
    df = spark.createDataFrame([(30,), (10,), (20,)], "movie_id int")
    got = {
        r["movie_id"]: r["movie_key"]
        for r in surrogate_key_small(df, ["movie_id"], "movie_key").collect()
    }
    assert got == {10: 1, 20: 2, 30: 3}


def test_ranged_matches_small(spark):
    df = spark.range(1000).withColumnRenamed("id", "nk")
    small = {
        r["nk"]: r["k"]
        for r in surrogate_key_small(df, ["nk"], "k").collect()
    }
    ranged = {
        r["nk"]: r["k"]
        for r in surrogate_key_ranged(df, ["nk"], "k", num_partitions=7).collect()
    }
    assert ranged == small


def test_ntile_ranged_matches_window_ntile(spark):
    """ntile_ranged == F.ntile over the same total order, across
    n/k shapes that exercise both bucket sizes, ties, and k > n."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    for n, k in [(1000, 4), (997, 10), (10, 4), (3, 8), (250, 7)]:
        # value has heavy ties (mod 17) -> tie-splitting must agree
        df = spark.range(n).select(
            F.col("id").alias("uid"), (F.col("id") % 17).alias("v")
        )
        order = [F.col("v").asc(), F.col("uid").asc()]
        want = {
            r["uid"]: r["b"]
            for r in df.select(
                "uid", F.ntile(k).over(Window.orderBy(*order)).alias("b")
            ).collect()
        }
        got = {
            r["uid"]: r["b"]
            for r in ntile_ranged(
                df, order, k, "b", num_partitions=7
            ).collect()
        }
        assert got == want, (n, k)


def test_ntile_ranged_desc_order(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    df = spark.range(300).select(
        F.col("id").alias("uid"), (F.col("id") % 5).alias("v")
    )
    order = [F.col("v").desc(), F.col("uid").asc()]
    want = {
        r["uid"]: r["b"]
        for r in df.select(
            "uid", F.ntile(10).over(Window.orderBy(*order)).alias("b")
        ).collect()
    }
    got = {
        r["uid"]: r["b"]
        for r in ntile_ranged(df, order, 10, "b", num_partitions=5).collect()
    }
    assert got == want

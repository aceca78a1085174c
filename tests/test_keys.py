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

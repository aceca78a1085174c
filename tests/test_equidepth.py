from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.profile import (
    equidepth_histogram,
    global_rank,
)


def _df(spark, n=97, seed=7, parts=None):
    rng = random.Random(seed)
    rows = [(i, rng.choice([1.0, 2.0, 2.0, 3.0, 5.0, 8.0])) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.repartition(parts) if parts else df


def test_global_rank_matches_single_partition_row_number(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, "v", "id").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("v").asc(), F.col("id").asc())
            ).cast("long"),
        ).collect()
    }
    assert got == want


def test_global_rank_partition_invariant(spark):
    a = sorted(
        (r["id"], r["rank"])
        for r in global_rank(_df(spark, parts=1), "v", "id").collect()
    )
    b = sorted(
        (r["id"], r["rank"])
        for r in global_rank(_df(spark, parts=13), "v", "id").collect()
    )
    assert a == b


def test_equidepth_matches_ntile(spark):
    # 97 rows / 8 buckets -> first 97%8=1 bucket has 13 rows, rest 12
    df = _df(spark)
    got = {
        r["bucket"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in equidepth_histogram(df, "v", "id", buckets=8).collect()
    }
    ntiled = df.withColumn(
        "bucket",
        F.ntile(8).over(Window.orderBy(F.col("v").asc(), F.col("id").asc())),
    )
    want = {
        r["bucket"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in ntiled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want
    assert sorted(n for n, _, _ in got.values()) == [12] * 7 + [13]


def test_equidepth_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["id", "v"]
    )
    out = equidepth_histogram(df, "v", "id", buckets=10).collect()
    # each row its own bucket; no division-by-zero from the empty tail
    assert sorted(r["bucket"] for r in out) == [1, 2, 3]
    assert all(r["n_rows"] == 1 for r in out)

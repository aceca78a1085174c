"""Skew salting correctness + bucketed-table shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import skew
from netflix_data_ingestion_spark.sources import writers


def test_salted_join_equals_plain_join(spark):
    # hot key: 5000 rows of key=1, a handful elsewhere
    big = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v")).union(
        spark.range(10).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    )
    small = spark.createDataFrame(
        [(1, "hot"), (3, "cold"), (99, "unmatched")], "k long, label string"
    )
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = skew.salted_join(big, small, "k", n_salts=4).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, label string")
    out = skew.salted_join(big, small, "k", n_salts=3, how="left").collect()
    got = {(r["k"], r["label"]) for r in out}
    assert got == {(1, "x"), (2, None)}


def test_salted_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plain = {
        (r["k"]): (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "cnt": ("v", "count"),
                "total": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_salts=5,
        ).collect()
    }
    assert salted == plain


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    writers.write_bucketed(left, "t_left", ["k"], 4, path=str(tmp_path / "l"))
    writers.write_bucketed(right, "t_right", ["k"], 4, path=str(tmp_path / "r"))
    try:
        l = writers.read_bucketed(spark, "t_left")
        r = writers.read_bucketed(spark, "t_right")
        joined = l.join(r, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_salt_advisor_factors_and_cut(spark):
    from netflix_data_ingestion_spark.operators.skew import salt_advisor

    rows = (
        [("hot",)] * 450 + [("warm",)] * 250 + [("cold",)] * 120
        + [("tiny",)] * 10
    )
    df = spark.createDataFrame(rows, "k string")
    out = {
        r["k"]: (r["n"], r["salt_factor"])
        for r in salt_advisor(df, ["k"], target_rows_per_task=100).collect()
    }
    # ceil(450/100)=5, ceil(250/100)=3, ceil(120/100)=2; tiny omitted
    assert out == {"hot": (450, 5), "warm": (250, 3), "cold": (120, 2)}

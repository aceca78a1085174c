"""forward_fill operators (reference primitive etl_pipeline_spark.py:1114-1122)."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.ffill import (
    forward_fill_global,
    forward_fill_grouped,
)


def test_grouped_fill(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, 10),
        ("a", 3, None),
        ("b", 1, None),
        ("b", 2, 20),
    ]
    df = spark.createDataFrame(rows, "k string, ord int, v int")
    out = forward_fill_grouped(df, ["k"], ["ord"], "v", "filled")
    got = {(r["k"], r["ord"]): r["filled"] for r in out.collect()}
    assert got == {
        ("a", 1): None,
        ("a", 2): 10,
        ("a", 3): 10,
        ("b", 1): None,
        ("b", 2): 20,
    }


def test_global_fill_across_partitions(spark):
    # values only in early rows; many partitions; later partitions must
    # receive the carry-in (the §4.4 bucket-boundary case)
    n = 5000
    rows = [(i, 111 if i == 7 else (222 if i == 2500 else None)) for i in range(n)]
    df = spark.createDataFrame(rows, "ord long, v int").repartitionByRange(8, "ord")
    out = forward_fill_global(df, "ord", "v", "filled").collect()
    got = {r["ord"]: r["filled"] for r in out}
    assert got[6] is None
    assert got[7] == 111
    assert got[2499] == 111
    assert got[2500] == 222
    assert got[n - 1] == 222


def test_global_fill_empty_partitions_ok(spark):
    df = (
        spark.range(0)
        .withColumn("v", F.lit(None).cast("int"))
        .withColumnRenamed("id", "ord")
    )
    assert forward_fill_global(df, "ord", "v", "filled").count() == 0

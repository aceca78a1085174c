from __future__ import annotations

from netflix_data_ingestion_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
)


def test_registers_bounded_and_merge_equals_whole(spark):
    from netflix_data_ingestion_spark.operators.merge import merge_aggregates

    df = spark.createDataFrame([(i % 500,) for i in range(3000)], ["x"])
    whole = hll_registers(df, "x", buckets=32)
    assert whole.count() <= 32
    # sketch(A) MAX-merged with sketch(B) == sketch(A union B)
    a = hll_registers(df.where("x < 250"), "x", buckets=32)
    b = hll_registers(df.where("x >= 250"), "x", buckets=32)
    merged = merge_aggregates(a, b, ["bucket"], max_cols=["register"])
    got = {r["bucket"]: r["register"] for r in merged.collect()}
    want = {r["bucket"]: r["register"] for r in whole.collect()}
    assert got == want


def test_estimate_accuracy(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(2000)], ["x"])
    regs = [
        (r["bucket"], r["register"])
        for r in hll_registers(df, "x", buckets=64).collect()
    ]
    est = hll_estimate(regs, buckets=64)
    # standard error ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert 2000 * 0.6 < est < 2000 * 1.4


def test_estimate_small_range_linear_counting(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], ["x"])
    regs = [
        (r["bucket"], r["register"])
        for r in hll_registers(df, "x", buckets=64).collect()
    ]
    est = hll_estimate(regs, buckets=64)
    assert 4 <= est <= 14  # linear-counting regime is tight


def test_duplicates_do_not_move_registers(spark):
    once = spark.createDataFrame([(i,) for i in range(100)], ["x"])
    many = spark.createDataFrame(
        [(i,) for i in range(100) for _ in range(7)], ["x"]
    )
    a = sorted(map(tuple, hll_registers(once, "x", buckets=16).collect()))
    b = sorted(map(tuple, hll_registers(many, "x", buckets=16).collect()))
    assert a == b

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.zorder import (
    zorder_key,
    zorder_layout,
)


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zkey_matches_reference_interleave(spark):
    # 4x4 grid with value range exactly [0, 4): buckets are the values
    # themselves at bits=2, so zkey must equal the textbook interleave
    rows = [(x * 4 + y, x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = {
        r["id"]: r["zkey"]
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    for x in range(4):
        for y in range(4):
            assert got[x * 4 + y] == _interleave2(x, y, 2)


def test_zkey_normalizes_arbitrary_ranges(spark):
    # shifted/scaled ranges: min maps to bucket 0, max to the top bucket
    df = spark.createDataFrame(
        [(0, -100, 1000), (1, 100, 3000)], ["id", "x", "y"]
    )
    got = {r["id"]: r["zkey"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    assert got[0] == 0
    assert got[1] == _interleave2(15, 15, 4)


def test_zorder_layout_gives_both_columns_locality(spark):
    # 32x32 grid, 16 range partitions: under Z-order EVERY partition
    # covers a small rectangle, so the per-partition span of BOTH
    # columns is far below the global span (under a plain x-sort the
    # y span would be the full 31 in every partition)
    rows = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    laid = zorder_layout(df, ["x", "y"], bits=5, num_partitions=16)
    spans = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) >= 8
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    assert avg_sx <= 16 and avg_sy <= 16  # rectangles, not stripes


def test_key_width_guard(spark):
    df = spark.createDataFrame([(1, 1, 1)], ["id", "x", "y"])
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(df, ["x", "y"], bits=32)

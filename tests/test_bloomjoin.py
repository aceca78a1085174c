from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.bloomjoin import (
    bloom_build,
    bloom_semi_join,
)


def _tables(spark):
    fact = spark.createDataFrame(
        [(i, i % 100) for i in range(2000)], ["row_id", "k"]
    )
    dim = spark.createDataFrame([(k,) for k in (3, 7, 42)], ["dk"])
    return fact, dim


def test_matches_plain_semi_join(spark):
    fact, dim = _tables(spark)
    got = sorted(
        r["row_id"]
        for r in bloom_semi_join(fact, "k", dim, "dk").collect()
    )
    want = sorted(
        r["row_id"]
        for r in fact.join(
            dim.select(F.col("dk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want and len(got) == 60


def test_tiny_filter_false_positives_are_corrected(spark):
    # 64 bits for 3 keys x 3 hashes -> heavy collisions; the exact join
    # must still produce the precise answer
    fact, dim = _tables(spark)
    got = sorted(
        r["k"]
        for r in bloom_semi_join(
            fact, "k", dim, "dk", n_bits=64, n_hashes=3
        ).select("k").distinct().collect()
    )
    assert got == [3, 7, 42]


def test_no_false_negatives_every_dim_key_survives_probe(spark):
    # probe the filter with the dim keys themselves: all bits must hit
    fact, dim = _tables(spark)
    probed = bloom_semi_join(
        dim.select(F.col("dk").alias("k")), "k", dim, "dk", n_bits=1 << 10
    )
    assert probed.count() == 3


def test_filter_words_are_bounded(spark):
    _, dim = _tables(spark)
    words = bloom_build(dim, "dk", n_bits=1 << 10, n_hashes=3).collect()
    assert 0 < len(words) <= (1 << 10) // 64
    assert all(r["word"] != 0 for r in words)


def test_probe_is_broadcast_no_fact_shuffle_before_prefilter(spark):
    fact, dim = _tables(spark)
    plan = (
        bloom_semi_join(fact, "k", dim, "dk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every probe join must broadcast the word table
    assert plan.count("BroadcastHashJoin") >= 3

"""Unit tests: count-min sketch guarantees, stratified sampling
proportions, exact nearest-rank quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import sketch
from netflix_data_ingestion_spark.operators.profile import exact_quantiles
from netflix_data_ingestion_spark.operators.sample import stratified_sample


def test_cms_estimate_is_one_sided_and_merges(spark):
    rows = [(i, i % 7) for i in range(200)] + [(200 + i, 99) for i in range(50)]
    df = spark.createDataFrame(rows, "rid long, item long")
    sk = sketch.cms_build(df, "item", width=32, depth=4)
    # sketch size is bounded by depth x width regardless of input rows
    assert sk.count() <= 32 * 4
    truth = {r["item"]: r["n"] for r in df.groupBy("item").agg(
        F.count("*").alias("n")).collect()}
    items = df.select("item").distinct()
    est = {
        r["item"]: r["est"]
        for r in sketch.cms_estimate(sk, items, "item", 32, 4).collect()
    }
    # one-sided error: estimate never undercounts
    assert all(est[i] >= truth[i] for i in truth)
    # the heavy hitter dominates collisions at this width
    assert est[99] >= 50

    # merging two half-sketches equals the whole-stream sketch
    from netflix_data_ingestion_spark.operators.merge import merge_aggregates

    h1 = sketch.cms_build(df.filter(F.col("rid") % 2 == 0), "item", 32, 4)
    h2 = sketch.cms_build(df.filter(F.col("rid") % 2 == 1), "item", 32, 4)
    merged = merge_aggregates(h1, h2, ["row", "bucket"], sum_cols=["cnt"])
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_heavy_hitters_exact_and_screened(spark):
    # 3 planted heavy keys among a long tail of singletons
    rows = (
        [(i, 1) for i in range(40)]
        + [(100 + i, 2) for i in range(25)]
        + [(200 + i, 3) for i in range(10)]
        + [(300 + i, 1000 + i) for i in range(60)]  # tail: one hit each
    )
    df = spark.createDataFrame(rows, "rid long, item long")
    got = {
        r["item"]: r["cnt"]
        for r in sketch.heavy_hitters(df, "item", threshold=10, width=32).collect()
    }
    # exact counts, no tail key leaks through the exact verify
    assert got == {1: 40, 2: 25, 3: 10}
    # narrow screen: tighter threshold excludes the boundary key
    got11 = {
        r["item"]
        for r in sketch.heavy_hitters(df, "item", threshold=11, width=32).collect()
    }
    assert got11 == {1, 2}
    # NULL items are dropped by the screen, not counted
    with_null = df.union(
        spark.createDataFrame([(9000 + i, None) for i in range(20)],
                              "rid long, item long")
    )
    gotn = {
        r["item"]
        for r in sketch.heavy_hitters(with_null, "item", threshold=10,
                                      width=32).collect()
    }
    assert gotn == {1, 2, 3}


def test_stratified_sample_proportions(spark):
    rows = [(i, "big") for i in range(100)] + [(1000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", "doc_id", 0.3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["big"]) == 30          # ceil(0.3 * 100)
    assert len(by_src["tiny"]) == 1          # ceil(0.3 * 3) — never empty
    # determinism: same seed -> same kept set
    again = stratified_sample(df, "source", "doc_id", 0.3).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_exact_quantiles_nearest_rank(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("b", 5.0)],
        "k string, v double",
    )
    out = {r["k"]: r for r in exact_quantiles(
        df, ["k"], "v", qs=(0.25, 0.5, 0.9)).collect()}
    # n=10: ranks ceil(2.5)=3, ceil(5)=5, ceil(9)=9
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p90"]) == (3.0, 5.0, 9.0)
    assert out["a"]["n"] == 10
    # singleton group: every quantile is the one value
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p90"]) == (5.0, 5.0, 5.0)


def test_cms_join_size_estimate_one_sided_and_tight(spark):
    # A has keys 0..49 once each; B has key k repeated (k % 5) + 1 times
    a = spark.createDataFrame([(k,) for k in range(50)], "k long")
    b = spark.createDataFrame(
        [(k,) for k in range(50) for _ in range(k % 5 + 1)], "k long"
    )
    true_size = a.join(b, "k").count()
    est = sketch.cms_join_size_estimate(a, "k", b, "k", width=64).collect()[0][
        "est_join_rows"
    ]
    # one-sided: never an underestimate
    assert est >= true_size
    # with 50 keys in 64 buckets, collisions stay moderate
    assert est <= true_size * 3
    # disjoint key spaces: estimate comes only from collisions, and a
    # wide sketch keeps it near zero relative to a real join
    c = spark.createDataFrame([(k + 1000,) for k in range(50)], "k long")
    est0 = sketch.cms_join_size_estimate(a, "k", c, "k", width=256).collect()[
        0
    ]["est_join_rows"]
    assert est0 < true_size


def test_exact_quantiles_ranged_matches_global_window(spark):
    """The distributed global quantile (range partition + broadcast
    offsets) picks the exact same nearest-rank values as the windowed
    form, including under heavy ties and at tiny n."""
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles,
        exact_quantiles_ranged,
    )

    for n in (1000, 37, 3):
        df = spark.range(n).select(((F.col("id") * 7919) % 101).alias("v"))
        want = exact_quantiles(
            df, [], "v", qs=(0.25, 0.5, 0.75, 0.9)
        ).collect()[0]
        got = exact_quantiles_ranged(
            df, "v", qs=(0.25, 0.5, 0.75, 0.9), num_partitions=5
        ).collect()[0]
        assert got.asDict() == want.asDict(), n


def test_exact_quantiles_ranged_empty_input(spark):
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles_ranged,
    )

    df = spark.range(5).select(F.col("id").alias("v")).where(F.col("v") < 0)
    row = exact_quantiles_ranged(df, "v", qs=(0.5,)).collect()[0]
    assert row["n"] == 0 and row["p50"] is None

from __future__ import annotations

import datetime as dt

from netflix_data_ingestion_spark.operators.intervals import merge_intervals


def _d(day):
    return dt.date(2024, 1, day)


def test_overlap_touch_and_gap_semantics(spark):
    rows = [
        # k=a: [1,5] overlaps [3,8]; [8,10] touches -> one run [1,10];
        # [15,16] is a separate island
        ("a", _d(1), _d(5)),
        ("a", _d(3), _d(8)),
        ("a", _d(8), _d(10)),
        ("a", _d(15), _d(16)),
        # k=b: containment collapses
        ("b", _d(1), _d(20)),
        ("b", _d(5), _d(6)),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = {
        (r["k"], r["period_start"]): (r["period_end"], r["n_intervals"])
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert out[("a", _d(1))] == (_d(10), 3)
    assert out[("a", _d(15))] == (_d(16), 1)
    assert out[("b", _d(1))] == (_d(20), 2)
    assert len(out) == 3


def test_later_interval_inside_earlier_long_one(spark):
    # running-max (not lag) semantics: [1,10] then [2,3] then [4,12]
    # must all merge even though [4,12] starts after [2,3] ends
    rows = [("k", _d(1), _d(10)), ("k", _d(2), _d(3)), ("k", _d(4), _d(12))]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    assert out[0]["period_start"] == _d(1)
    assert out[0]["period_end"] == _d(12)


def test_partition_invariant(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(300):
        s = rng.randint(1, 300)
        rows.append((f"k{i % 7}", s, s + rng.randint(0, 10)))
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    a = sorted(
        map(tuple, merge_intervals(df.repartition(1), ["k"], "s", "e").collect())
    )
    b = sorted(
        map(tuple, merge_intervals(df.repartition(17), ["k"], "s", "e").collect())
    )
    assert a == b

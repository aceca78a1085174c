"""Time-bucket gap filling (operators/gapfill.py)."""

import datetime

from netflix_data_ingestion_spark.operators.gapfill import (
    time_bucket_gapfill,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_gapfill_densify_and_locf(spark):
    # user 1: events in hours 0 and 3 — hours 1 and 2 are gaps
    # user 2: single event — one bucket, no gaps
    df = spark.createDataFrame(
        [
            (1, _ts(0, 10), 1.0),
            (1, _ts(0, 20), 2.0),
            (1, _ts(3, 5), 10.0),
            (2, _ts(5, 0), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = time_bucket_gapfill(df, "user_id", "ts", "value", "1 hour")
    rows = {
        (r["user_id"], r["bucket_start"].hour): r for r in out.collect()
    }
    assert len(rows) == 5  # u1: hours 0..3 dense; u2: hour 5
    assert rows[(1, 0)]["n_events"] == 2
    assert rows[(1, 0)]["sum_value"] == 3.0
    # gap rows: zero count, NULL sum, carried locf
    for h in (1, 2):
        r = rows[(1, h)]
        assert r["n_events"] == 0
        assert r["sum_value"] is None
        assert r["locf_value"] == 3.0
    assert rows[(1, 3)]["locf_value"] == 10.0
    assert rows[(2, 5)]["n_events"] == 1 and rows[(2, 5)]["locf_value"] == 7.0


def test_gapfill_spine_is_per_key(spark):
    # keys with disjoint active ranges must not densify each other's range
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (2, _ts(23), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    out = time_bucket_gapfill(df, "user_id", "ts", "value", "1 hour")
    assert out.count() == 2  # one bucket each, no 24-hour cross product

"""Bucketed range join: boundary semantics + physical plan shape."""

from __future__ import annotations

from datetime import datetime

from netflix_data_ingestion_spark.operators.rangejoin import range_join_bucketed


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:04:00")),  # inside iv A
            (2, 10, _ts("2024-01-01T00:05:00")),  # exactly at A's end (incl)
            (3, 10, _ts("2024-01-01T00:00:00")),  # exactly at A's start
            (4, 10, _ts("2024-01-01T00:05:01")),  # just outside A
            (5, 20, _ts("2024-01-01T00:04:00")),  # other key -> no match
            # crosses a 300s bucket boundary relative to iv B
            (6, 10, _ts("2024-01-01T01:07:30")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", 10, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:05:00")),
            # B spans buckets [01:02:30, 01:08:20]: covers 3 buckets of 300s
            ("B", 10, _ts("2024-01-01T01:02:30"), _ts("2024-01-01T01:08:20")),
        ],
        "iv_id string, user_id long, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_range_join_boundaries(spark):
    points, intervals = _frames(spark)
    out = range_join_bucketed(points, intervals).collect()
    got = sorted((r["event_id"], r["iv_id"]) for r in out)
    assert got == [(1, "A"), (2, "A"), (3, "A"), (6, "B")]


def test_range_join_is_hash_join_not_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = range_join_bucketed(
        points, intervals
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan

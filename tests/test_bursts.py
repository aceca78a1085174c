"""Burst collapse (operators/bursts.py)."""

from __future__ import annotations

import datetime as dt

from netflix_data_ingestion_spark.operators.bursts import collapse_bursts


def _t(s):
    return dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(seconds=s)


def test_burst_chain_collapses_to_first(spark):
    """Events at 0s, 200s, 400s chain (each gap < 300) into ONE burst
    even though first-to-last exceeds the gap; exactly-300s starts a
    new burst (half-open rule)."""
    rows = [
        (1, 7, "click", _t(0)),
        (2, 7, "click", _t(200)),
        (3, 7, "click", _t(400)),
        (4, 7, "click", _t(700)),   # 300s after #3 -> NEW burst
        (5, 7, "view", _t(0)),      # different type: own burst
        (6, 8, "click", _t(0)),     # different user: own burst
        (7, 7, "click", None),      # NULL ts dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        r["event_id"]: r["burst_size"]
        for r in collapse_bursts(
            df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=300
        ).collect()
    }
    assert out == {1: 3, 4: 1, 5: 1, 6: 1}


def test_burst_equal_timestamps_total_order(spark):
    """Same-instant duplicates collapse deterministically to the lowest
    tiebreak id."""
    rows = [(i, 1, "click", _t(0)) for i in (5, 3, 9)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = collapse_bursts(
        df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=60
    ).collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 3 and out[0]["burst_size"] == 3


def test_cooldown_resets_on_admission_not_on_events(spark):
    """Drizzle at 0,50,120,130,260s with 100s cool-down: admissions at
    0, 120, 260 — island semantics would collapse 0..130 into ONE."""
    rows = [
        (1, 1, "c", _t(0)), (2, 1, "c", _t(50)), (3, 1, "c", _t(120)),
        (4, 1, "c", _t(130)), (5, 1, "c", _t(260)),
        (6, 2, "c", _t(0)), (7, 2, "c", _t(300)),
        (8, 1, "c", None),
    ]
    from netflix_data_ingestion_spark.operators.bursts import (
        collapse_bursts,
        cooldown_throttle,
    )

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    admitted = sorted(
        r["event_id"]
        for r in cooldown_throttle(
            df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=100
        ).collect()
    )
    assert admitted == [1, 3, 5, 6, 7]
    # contrast: island collapse keeps only the burst heads 1, 5 (gaps
    # 50/70/10 chain 1..4; 130->260 is a 130s gap, new burst), 6, 7
    heads = sorted(
        r["event_id"]
        for r in collapse_bursts(
            df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=100
        ).collect()
    )
    assert heads == [1, 5, 6, 7]


def test_cooldown_rejects_non_integral_tiebreak(spark):
    """A string tiebreak would cast to NULL and silently admit nothing —
    the guard must fail loudly instead."""
    import pytest

    from netflix_data_ingestion_spark.operators.bursts import (
        cooldown_throttle,
    )

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a")], "k int, ts timestamp, tb string"
    )
    with pytest.raises(ValueError, match="integral"):
        cooldown_throttle(df, ["k"], "ts", "tb", gap_seconds=60)

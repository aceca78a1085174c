"""Trailing event-time range windows (operators/rolling.py)."""

import datetime

from netflix_data_ingestion_spark.operators.rolling import (
    trailing_range_stats,
)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_trailing_window_half_open(spark):
    # events at t=0, t=30min, t=60min: the t=60min frame must contain
    # 30min and 60min but NOT the event exactly one hour old
    df = spark.createDataFrame(
        [
            (1, 1, _ts(0), 1.5),
            (2, 1, _ts(30), 2.25),
            (3, 1, _ts(59, 59), 4.0),
            (4, 2, _ts(10), 10.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in trailing_range_stats(
            df, "user_id", "ts", "value", window_seconds=3600
        ).collect()
    }
    assert out[1]["n_trailing"] == 1 and out[1]["sum_value_trailing"] == 1.5
    assert out[2]["n_trailing"] == 2 and out[2]["sum_value_trailing"] == 3.75
    assert out[3]["n_trailing"] == 3 and out[3]["sum_value_trailing"] == 7.75
    # other keys never leak in
    assert out[4]["n_trailing"] == 1 and out[4]["sum_value_trailing"] == 10.0


def test_trailing_window_expiry(spark):
    # second event exactly 3600s after the first: first has expired
    df = spark.createDataFrame(
        [
            (1, 1, datetime.datetime(2024, 1, 1, 0, 0, 0), 5.0),
            (2, 1, datetime.datetime(2024, 1, 1, 1, 0, 0), 7.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in trailing_range_stats(
            df, "user_id", "ts", "value", window_seconds=3600
        ).collect()
    }
    assert out[2]["n_trailing"] == 1
    assert out[2]["sum_value_trailing"] == 7.0


def test_trailing_distinct_daily_counts_and_zero_fills(spark):
    from netflix_data_ingestion_spark.operators.rolling import (
        trailing_distinct_daily,
    )

    rows = [
        # u1 active twice on day 1 and once on day 2: counts ONCE per window
        ("2024-01-01 01:00:00", 1),
        ("2024-01-01 09:00:00", 1),
        ("2024-01-02 01:00:00", 1),
        ("2024-01-02 02:00:00", 2),
        # long gap: days 3..9 have no events at all
        ("2024-01-10 00:00:00", 3),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    out = {
        str(r["day"]): r["n_active"]
        for r in trailing_distinct_daily(df, "ts", "user_id", 3).collect()
    }
    # spine covers every day from min to max, gaps zero-filled
    assert len(out) == 10
    assert out["2024-01-01"] == 1          # u1 (deduped within the day)
    assert out["2024-01-02"] == 2          # u1 (once across both days), u2
    assert out["2024-01-03"] == 2          # window [1..3]
    assert out["2024-01-04"] == 2          # window [2..4]: u1 and u2 on day 2
    assert all(out[f"2024-01-0{d}"] == 0 for d in (5, 6, 7, 8, 9))
    assert out["2024-01-10"] == 1          # u3


def test_trailing_ewma_horner_and_partial_windows(spark):
    import datetime as dt

    from netflix_data_ingestion_spark.operators.rolling import trailing_ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", 1, t0, 10.0),
        ("u", 2, t0 + dt.timedelta(minutes=1), 20.0),
        ("u", 3, t0 + dt.timedelta(minutes=2), 30.0),
        ("v", 4, t0, 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "id", "ts", "v"])
    out = {
        r["id"]: r["ewma"]
        for r in trailing_ewma(
            df, ["k"], ["ts", "id"], "v", window=2, alpha=0.25
        ).collect()
    }
    # first row: partial window of 1 -> unbiased == value
    assert out[1] == 10.0
    assert out[4] == 7.0
    # window=2 Horner fold: (10*0.75+20)/(0.75+1), then (20*0.75+30)/1.75
    assert out[2] == (10.0 * 0.75 + 20.0) / 1.75
    assert out[3] == (20.0 * 0.75 + 30.0) / 1.75


def test_ohlc_resample_ties_nulls_and_selection(spark):
    from netflix_data_ingestion_spark.operators.resample import ohlc_resample

    def t(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    df = spark.createDataFrame(
        [
            ("a", t(10, 0), 2, 7.0),   # ts-tie with event 1: id breaks it
            ("a", t(10, 0), 1, 5.0),
            ("a", t(10, 59), 3, 2.0),
            ("a", t(11, 1), 4, 9.0),
            ("b", None, 5, 1.0),       # NULL ts: no bar
        ],
        "k string, ts timestamp, eid long, v double",
    )
    out = {
        (r["k"], r["bucket"].hour): r
        for r in ohlc_resample(df, ["k"], "ts", "eid", "v").collect()
    }
    bar = out[("a", 10)]
    # open = earliest (ts, eid) = event 1; close = latest = event 3
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (
        5.0, 7.0, 2.0, 2.0)
    assert bar["n_events"] == 3
    assert out[("a", 11)]["open"] == out[("a", 11)]["close"] == 9.0
    assert ("b", None) not in out and len(out) == 2


def test_time_weighted_average_holds_values_by_duration(spark):
    """Value 10 held 9s then 100 held 1s -> TWA 19.0; the plain mean
    (55) would be wrong. Single-sample day -> NULL with zero span."""
    import datetime as dt

    from netflix_data_ingestion_spark.operators.resample import (
        time_weighted_average,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(seconds=9), 100.0),
        (1, base + dt.timedelta(seconds=10), 100.0),
        (2, base, 42.0),  # lone sample
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["user_id"]): (r["n_samples"], r["span_micros"], r["twa_value"])
        for r in time_weighted_average(df, "user_id", "ts", "value", scale=1)
        .collect()
    }
    assert out[1] == (3, 10_000_000, 19.0)
    assert out[2] == (1, 0, None)

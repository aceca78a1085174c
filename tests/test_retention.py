from __future__ import annotations

import datetime as dt

import pytest

from netflix_data_ingestion_spark.operators.retention import cohort_retention


def _events(spark):
    t = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        # cohort Mon 2024-01-01 (week of Jan 1): users 1, 2
        (1, t(1)), (2, t(2)),
        # user 1 returns in week+1 and week+2; user 2 never returns
        (1, t(8)), (1, t(16)),
        # cohort week of Jan 8: user 3, returns week+2
        (3, t(10)), (3, t(22)),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_weekly_retention_triangle(spark):
    out = {
        (r["cohort_week"], r["weeks_since"]): r
        for r in cohort_retention(_events(spark), "user_id", "ts").collect()
    }
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    # anchor rows: retained == cohort_size, rate exactly 1.0
    assert out[(w1, 0)]["cohort_size"] == 2
    assert out[(w1, 0)]["retained"] == 2
    assert out[(w1, 0)]["retention_rate"] == 1.0
    # only user 1 returned in weeks 1 and 2
    assert out[(w1, 1)]["retained"] == 1
    assert out[(w1, 1)]["retention_rate"] == 0.5
    assert out[(w1, 2)]["retained"] == 1
    # second cohort: gap weeks emit no row (sparse triangle)
    assert out[(w2, 0)]["cohort_size"] == 1
    assert (w2, 1) not in out
    assert out[(w2, 2)]["retained"] == 1
    assert len(out) == 5


def test_duplicate_events_count_once(spark):
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t), (1, t), (1, t + dt.timedelta(hours=5))], ["user_id", "ts"]
    )
    rows = cohort_retention(df, "user_id", "ts").collect()
    assert len(rows) == 1
    assert rows[0]["retained"] == 1


def test_day_bucket(spark):
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    df = spark.createDataFrame(
        [(1, t(1)), (1, t(3)), (2, t(2))], ["user_id", "ts"]
    )
    out = {
        (r["cohort_week"], r["weeks_since"]): r["retained"]
        for r in cohort_retention(
            df, "user_id", "ts", bucket="day"
        ).collect()
    }
    assert out[(dt.date(2024, 1, 1), 0)] == 1
    assert out[(dt.date(2024, 1, 1), 2)] == 1
    assert out[(dt.date(2024, 1, 2), 0)] == 1


def test_invalid_bucket_rejected(spark):
    with pytest.raises(ValueError, match="bucket"):
        cohort_retention(_events(spark), "user_id", "ts", bucket="month")

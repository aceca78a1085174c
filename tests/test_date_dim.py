"""dim_date derivations (reference etl_pipeline_spark.py:757-811, schema.sql:28-47)."""

from __future__ import annotations

import datetime

from netflix_data_ingestion_spark.plans.star import build_dim_date


def test_reference_range_cardinality(spark):
    # 1998-10-01..2005-12-31 = exactly 2,649 days (BASELINE.md caveat:
    # the reference README claims 2,865/2,920; the code range is 2,649)
    assert build_dim_date(spark).count() == 2649


def test_derivations_contract(spark):
    rows = {
        r["date_actual"]: r
        for r in build_dim_date(spark, "2004-02-27", "2004-03-01").collect()
    }
    # leap year Feb 29 present
    assert datetime.date(2004, 2, 29) in rows
    sat = rows[datetime.date(2004, 2, 28)]
    sun = rows[datetime.date(2004, 2, 29)]
    mon = rows[datetime.date(2004, 3, 1)]
    # day_of_week: 0=Monday .. 6=Sunday (documented contract, schema.sql:47)
    assert (sat["day_of_week"], sun["day_of_week"], mon["day_of_week"]) == (5, 6, 0)
    assert sat["is_weekend"] and sun["is_weekend"] and not mon["is_weekend"]
    assert mon["date_key"] == 20040301
    assert mon["month_name"] == "March"
    assert mon["quarter"] == 1
    assert (mon["year"], mon["month"], mon["day"]) == (2004, 3, 1)


def test_check_constraints_hold(spark):
    df = build_dim_date(spark)
    bad = df.filter(
        ~df.day_of_week.between(0, 6)
        | ~df.month.between(1, 12)
        | ~df.quarter.between(1, 4)
    )
    assert bad.count() == 0

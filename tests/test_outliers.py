from __future__ import annotations

from netflix_data_ingestion_spark.operators.outliers import zscore_outliers


def _df(spark):
    # group "a": values [0,0,0,0,100] -> mean 20, stddev_pop 40, so the
    # 100 sits at EXACTLY z = 2; group "b" is flat (zero variance)
    rows = [("a", i, v) for i, v in enumerate([0.0, 0.0, 0.0, 0.0, 100.0])]
    rows += [("b", i, 5.0) for i in range(4)]
    return spark.createDataFrame(rows, ["g", "row_id", "v"])


def test_strict_inequality_at_exact_boundary(spark):
    # |x - mean| == 2*sigma exactly -> NOT an outlier at z=2 (strict >)
    out = zscore_outliers(_df(spark), ["g"], "v", z_num=2, z_den=1, scale=1)
    assert out.count() == 0


def test_rational_threshold_below_boundary_flags(spark):
    # z = 199/100 < 2 -> the planted point is now past the threshold
    out = zscore_outliers(
        _df(spark), ["g"], "v", z_num=199, z_den=100, scale=1
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g"], r["row_id"]) == ("a", 4)
    assert r["value_units"] == 100
    assert r["group_n"] == 5
    assert r["is_high"] is True


def test_zero_variance_group_never_flags(spark):
    out = zscore_outliers(
        _df(spark), ["g"], "v", z_num=1, z_den=100, scale=1
    ).where("g = 'b'")
    assert out.count() == 0


def test_low_outliers_flagged_with_is_high_false(spark):
    rows = [("a", i, 50.0) for i in range(10)] + [("a", 10, -50.0)]
    df = spark.createDataFrame(rows, ["g", "row_id", "v"])
    out = zscore_outliers(df, ["g"], "v", z_num=2, z_den=1, scale=1).collect()
    assert len(out) == 1
    assert out[0]["row_id"] == 10
    assert out[0]["is_high"] is False


def test_stats_join_is_broadcast(spark):
    plan = (
        zscore_outliers(_df(spark), ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_null_values_stay_out_of_all_moments(spark):
    # a NULL value must not inflate n while being absent from s/q —
    # the group's stats (and flags) must equal the null-free frame's
    rows = [("g", i, float(v)) for i, v in enumerate([10, 10, 10, 10, 100])]
    with_null = rows + [("g", 99, None)]
    df_clean = spark.createDataFrame(rows, "g string, row_id long, v double")
    df_null = spark.createDataFrame(
        with_null, "g string, row_id long, v double"
    )
    a = sorted(
        (r["row_id"], r["group_n"])
        for r in zscore_outliers(df_clean, ["g"], "v", z_num=1, scale=1).collect()
    )
    b = sorted(
        (r["row_id"], r["group_n"])
        for r in zscore_outliers(df_null, ["g"], "v", z_num=1, scale=1).collect()
    )
    assert a == b


def test_winsorize_clips_tails_only(spark):
    from netflix_data_ingestion_spark.operators.outliers import winsorize

    rows = [("g", i, float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "grp string, rid long, v double")
    got = {r["rid"]: r["v_winsorized"] for r in winsorize(
        df, ["grp"], "v", lo_q=0.1, hi_q=0.9).collect()}
    # n=10: lo = rank ceil(1)=1 -> 1.0; hi = rank ceil(9)=9 -> 9.0
    assert got[9] == 9.0          # the 1000 outlier clipped to p90
    assert got[0] == 1.0          # lower bound is its own value
    assert all(got[i] == float(i + 1) for i in range(9))


def test_seasonal_anomaly_flags_spike_in_its_slot_only(spark):
    """4 Mondays at 9am with counts (10, 10, 10, 50): the spike hour is
    flagged high against ITS seasonal slot; a busier-but-normal slot
    (Tuesdays at 9am, steady 40/hour) stays quiet even though every
    Monday count is below it."""
    import datetime as dt

    from netflix_data_ingestion_spark.operators.outliers import (
        seasonal_anomalies,
    )

    rows = []
    eid = 0
    # Mondays 2024-01-01/08/15/22 at 09:xx
    for week, n in zip((0, 1, 2, 3), (10, 10, 10, 50)):
        base = dt.datetime(2024, 1, 1, 9, 0) + dt.timedelta(weeks=week)
        for i in range(n):
            rows.append((eid, base + dt.timedelta(minutes=i % 60))); eid += 1
    # Tuesdays at 09:xx, steady 40
    for week in range(4):
        base = dt.datetime(2024, 1, 2, 9, 0) + dt.timedelta(weeks=week)
        for i in range(40):
            rows.append((eid, base + dt.timedelta(minutes=i % 60))); eid += 1
    rows.append((eid, None))  # NULL ts ignored
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = seasonal_anomalies(df, "ts", k_num=2, k_den=1).collect()
    flagged = {(r["bucket_ts"], r["dow"], r["hod"], r["is_high"]) for r in out}
    assert flagged == {
        (dt.datetime(2024, 1, 22, 9, 0), 0, 9, True)
    }
    # and the flagged row carries its slot's baseline, not the global one
    row = out[0]
    assert row["season_median"] == 10 and row["cnt"] == 50

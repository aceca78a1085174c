"""Distribution drift report (operators/drift.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.drift import drift_report


def test_drift_identical_distributions_zero_delta(spark):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    )
    out = drift_report(ref, ref, "x", bins=4, scale=1).collect()
    assert len(out) == 4
    assert all(r["delta_ppm"] == 0 for r in out)
    assert all(r["ref_ppm"] == r["cur_ppm"] == 250000 for r in out)
    # equi-depth on 1..100 with quartile cuts at 25/50/75
    los = {r["bin"]: r["lo_units"] for r in out}
    assert los == {1: None, 2: 25, 3: 50, 4: 75}


def test_drift_mass_shift_flags_tail_bin(spark):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    )
    # current: everything in the top reference quartile
    cur = spark.createDataFrame(
        [(float(v),) for v in range(80, 100)], "x double"
    )
    out = {r["bin"]: r for r in drift_report(ref, cur, "x", bins=4, scale=1).collect()}
    assert out[4]["cur_ppm"] == 1000000 and out[4]["delta_ppm"] == 750000
    # drained bins still appear with zero current mass
    assert out[1]["cur_n"] == 0 and out[1]["delta_ppm"] == 250000


def test_drift_unseen_values_land_in_edge_bins(spark):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    )
    cur = spark.createDataFrame([(-50.0,), (1000.0,)], "x double")
    out = {r["bin"]: r for r in drift_report(ref, cur, "x", bins=4, scale=1).collect()}
    assert out[1]["cur_n"] == 1 and out[4]["cur_n"] == 1


def test_drift_empty_current_side_yields_null_shares(spark):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    )
    cur = ref.filter("x < 0")  # empty
    out = drift_report(ref, cur, "x", bins=4, scale=1).collect()
    assert len(out) == 4
    assert all(r["cur_n"] == 0 and r["cur_ppm"] is None for r in out)

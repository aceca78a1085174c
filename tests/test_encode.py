"""Leave-one-out target encoding (operators/encode.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.encode import target_encode_loo


def test_loo_excludes_own_row(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "a", 30.0),
        (4, "b", 100.0),   # singleton -> NULL
        (5, None, 1.0),    # NULL category group
        (6, None, 3.0),
        (7, "a", None),    # NULL target -> NULL encoding, excluded from stats
    ]
    df = spark.createDataFrame(rows, "rid long, cat string, y double")
    out = {
        r["rid"]: r["loo_mean"]
        for r in target_encode_loo(df, "cat", "y", scale=1).collect()
    }
    # category a stats exclude rid 7: n=3, sum=60
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    assert out[4] is None                    # singleton
    assert out[5] == 3.0 and out[6] == 1.0   # NULL category is a group
    assert out[7] is None                    # NULL target


def test_loo_no_label_leak(spark):
    """Perturbing ONE row's target must not change that row's own
    encoding (the leak the LOO construction removes)."""
    rows = [(i, "a", float(i)) for i in range(1, 6)]
    df1 = spark.createDataFrame(rows, "rid long, cat string, y double")
    rows2 = [(1, "a", 999.0)] + rows[1:]
    df2 = spark.createDataFrame(rows2, "rid long, cat string, y double")
    e1 = {r["rid"]: r["loo_mean"] for r in target_encode_loo(df1, "cat", "y", scale=1).collect()}
    e2 = {r["rid"]: r["loo_mean"] for r in target_encode_loo(df2, "cat", "y", scale=1).collect()}
    assert e1[1] == e2[1] == 3.5   # (2+3+4+5)/4 either way
    assert e1[2] != e2[2]          # others DO see the change


def test_standardize_fits_on_train_only(spark):
    """Changing a TEST row's value must not change anyone's scaling;
    changing a TRAIN row's value changes everyone's."""
    from netflix_data_ingestion_spark.operators.encode import (
        standardize_by_train,
    )

    rows = [(1, "train", 10.0), (2, "train", 20.0), (3, "train", 30.0),
            (4, "test", 1000.0), (5, "test", None)]
    df1 = spark.createDataFrame(rows, "rid long, split string, x double")
    out1 = {r["rid"]: r["value_scaled"] for r in standardize_by_train(
        df1, "split", "x", scale=1).collect()}
    # train mean 20, sample std 10 -> z of train rows -1, 0, 1
    assert out1[1] == -1.0 and out1[2] == 0.0 and out1[3] == 1.0
    assert out1[4] == 98.0      # (1000-20)/10
    assert out1[5] is None
    # perturb the test row: identical output for others
    rows2 = rows[:3] + [(4, "test", 5.0), (5, "test", None)]
    df2 = spark.createDataFrame(rows2, "rid long, split string, x double")
    out2 = {r["rid"]: r["value_scaled"] for r in standardize_by_train(
        df2, "split", "x", scale=1).collect()}
    assert all(out1[k] == out2[k] for k in (1, 2, 3))
    assert out2[4] == -1.5


def test_standardize_degenerate_train(spark):
    from netflix_data_ingestion_spark.operators.encode import (
        standardize_by_train,
    )

    # zero-variance train -> all NULL; singleton train -> all NULL
    for rows in ([(1, "train", 5.0), (2, "train", 5.0), (3, "test", 9.0)],
                 [(1, "train", 5.0), (2, "test", 9.0)]):
        df = spark.createDataFrame(rows, "rid long, split string, x double")
        out = standardize_by_train(df, "split", "x", scale=1).collect()
        assert all(r["value_scaled"] is None for r in out)

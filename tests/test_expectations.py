from __future__ import annotations

from netflix_data_ingestion_spark.operators import expectations as ex


def _df(spark):
    rows = [
        (1, 10.0, "O", "1-URGENT", 100),
        (2, -5.0, "X", "9-BOGUS", 100),  # range, set, regex violations
        (2, 50.0, "F", "2-HIGH", 999),   # duplicate key, dangling FK
        (None, None, None, None, None),  # nulls
    ]
    return spark.createDataFrame(
        rows, ["k", "price", "status", "prio", "cust"]
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (200,)], ["ck"])


def _report(spark):
    return {
        (r["check"], r["column"]): r
        for r in ex.run_expectations(
            _df(spark),
            [
                ex.expect_not_null("k"),
                ex.expect_unique("k"),
                ex.expect_in_range("price", 0, 100),
                ex.expect_in_set("status", ["O", "F", "P"]),
                ex.expect_regex("prio", "^[1-5]-"),
                ex.expect_foreign_key("cust", _dim(spark), "ck"),
            ],
        ).collect()
    }


def test_each_check_counts_its_own_violations(spark):
    rep = _report(spark)
    assert rep[("not_null", "k")]["n_violations"] == 1
    # duplicate k=2 counts once; NULL keys are not_null's job
    assert rep[("unique", "k")]["n_violations"] == 1
    assert rep[("in_range", "price")]["n_violations"] == 1
    assert rep[("in_set", "status")]["n_violations"] == 1
    assert rep[("regex", "prio")]["n_violations"] == 1
    # NULL cust is not a dangling reference; 999 is
    assert rep[("foreign_key", "cust")]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert not any(r["passed"] for r in rep.values())


def test_nulls_do_not_leak_into_value_checks(spark):
    df = _df(spark).where("k = 1")  # single clean row + implicit schema
    rep = {
        (r["check"], r["column"]): r
        for r in ex.run_expectations(
            df,
            [
                ex.expect_in_range("price", 0, 100),
                ex.expect_in_set("status", ["O"]),
            ],
        ).collect()
    }
    assert all(r["passed"] for r in rep.values())


def test_count_nulls_opt_in(spark):
    rep = {
        r["check"]: r
        for r in ex.run_expectations(
            _df(spark),
            [ex.expect_in_range("price", 0, 100, count_nulls=True)],
        ).collect()
    }
    # -5.0 out of range + the NULL now counted
    assert rep["in_range"]["n_violations"] == 2


def test_single_aggregation_pass_for_row_checks(spark):
    report = ex.run_expectations(
        _df(spark),
        [
            ex.expect_not_null("k"),
            ex.expect_in_range("price", 0, 100),
            ex.expect_in_set("status", ["O", "F", "P"]),
            ex.expect_regex("prio", "^[1-5]-"),
        ],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    # four row-level checks, one scan of the input
    assert plan.count("Scan ExistingRDD") <= 1


def test_schema_diff_detects_all_change_kinds(spark):
    from netflix_data_ingestion_spark.operators.expectations import (
        schema_diff,
    )

    a = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, v double")
    b = spark.createDataFrame([(1, "x", 2)], "id long, name string, v int")
    c = spark.createDataFrame([(1, "x", True)], "id long, label string, extra boolean")
    assert schema_diff(a, a) == []
    d = schema_diff(a, b)
    assert len(d) == 1 and d[0]["change"] == "retyped" and d[0]["column"] == "v"
    kinds = {r["column"]: r["change"] for r in schema_diff(a, c)}
    assert kinds == {"name": "removed", "label": "added",
                     "v": "removed", "extra": "added"}

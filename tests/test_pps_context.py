from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.context import trailing_context
from netflix_data_ingestion_spark.operators.sample import (
    pps_systematic_sample,
)


def _docs(spark, parts=None):
    rows = [("s", i, 10) for i in range(50)] + [("s", 100, 10_000)]
    rows += [("t", 200 + i, 1) for i in range(30)]
    df = spark.createDataFrame(rows, ["src", "doc_id", "w"])
    return df.repartition(parts) if parts else df


def test_pps_bounds_and_heavy_row_multiplicity(spark):
    out = {
        r["doc_id"]: r["n_hits"]
        for r in pps_systematic_sample(
            _docs(spark), "src", "doc_id", "w", k=5
        ).where("src = 's'").collect()
    }
    # total=10500, step=2100; the 10k-weight doc spans >= 4 multiples
    assert out[100] >= 4
    # per-group total hits == floor(total/step) == 5
    assert sum(out.values()) == 5
    # selected row count can never exceed k
    assert len(out) <= 5


def test_pps_zero_weight_never_selected(spark):
    df = spark.createDataFrame(
        [("s", 1, 0), ("s", 2, 0), ("s", 3, 7)], ["src", "doc_id", "w"]
    )
    out = pps_systematic_sample(df, "src", "doc_id", "w", k=2).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_pps_partition_invariant(spark):
    a = sorted(
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(
            _docs(spark, parts=1), "src", "doc_id", "w", k=7
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(
            _docs(spark, parts=13), "src", "doc_id", "w", k=7
        ).collect()
    )
    assert a == b and a


def test_trailing_context_order_and_partial_head(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, "u", t(0), "view"),
            (2, "u", t(1), "click"),
            (3, "u", t(2), "purchase"),
            (4, "v", t(0), "view"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {
        r["event_id"]: r["context"]
        for r in trailing_context(
            df, ["user_id"], ["ts", "event_id"], "event_type", n=2
        ).collect()
    }
    assert out == {
        1: "view",
        2: "view click",
        3: "click purchase",
        4: "view",
    }


def test_trailing_context_plan_is_one_exchange_no_python(spark):
    df = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1), "view")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    plan = (
        trailing_context(df, ["user_id"], ["ts", "event_id"], "event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan

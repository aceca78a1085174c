"""Transition matrix + column profiler (operators/transitions, profile)."""

import datetime

from netflix_data_ingestion_spark.operators.profile import profile_columns
from netflix_data_ingestion_spark.operators.transitions import (
    transition_matrix,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_transition_counts_and_probs(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "view"),
        (1, _ts(3), "click"),
        (2, _ts(0), "view"), (2, _ts(1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): r
        for r in transition_matrix(df, "user_id", "ts", "event_type").collect()
    }
    # view -> click twice, view -> purchase once, click -> view once
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "purchase")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    # row-normalized: P(click|view)=2/3, P(purchase|view)=1/3
    assert abs(out[("view", "click")]["p"] - 2 / 3) < 1e-12
    assert abs(out[("view", "purchase")]["p"] - 1 / 3) < 1e-12
    assert out[("click", "view")]["p"] == 1.0
    # no cross-user pair (user 1's last event never chains to user 2's)
    assert ("click", "purchase") not in out


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    out = {
        r["column_name"]: r for r in profile_columns(df, ["k", "s"]).collect()
    }
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_nulls"] == 1 and out["k"]["n_distinct"] == 2
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2


def test_histogram_buckets(spark):
    from netflix_data_ingestion_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (5.0,), (9.9,), (10.0,), (25.0,), (100.0,), (150.0,)],
        "v double",
    )
    out = {r["bucket"]: r["n"] for r in histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert out[0] == 1            # underflow (-5)
    assert out[1] == 3            # [0,10): 0, 5, 9.9
    assert out[2] == 1            # [10,20): 10.0 — lower edge inclusive
    assert out[3] == 1            # [20,30): 25
    assert out[11] == 2           # overflow: 100 (hi is exclusive), 150
    assert sum(out.values()) == 8  # every row accounted for


def test_skew_report_ranks_heavy_keys(spark):
    from netflix_data_ingestion_spark.operators.profile import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], top=2).collect()
    assert [(r["k"], r["n"], r["rank"]) for r in out] == [
        ("hot", 60, 1), ("warm", 30, 2),
    ]
    assert abs(out[0]["share"] - 0.6) < 1e-12


def test_skew_report_reliable_mode_same_output(spark):
    """reliable=True swaps the localCheckpoint pin for a replicated
    persist (fault-tolerant: lineage kept) — results must be identical
    and the input still scanned exactly once on the success path."""
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.profile import skew_report

    acc = spark.sparkContext.accumulator(0)

    def bump(k):
        acc.add(1)
        return k

    bump_udf = F.udf(bump, "string")
    base = spark.createDataFrame(
        [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10, "k string"
    ).select(bump_udf("k").alias("k"))
    out = skew_report(base, ["k"], top=2, reliable=True)
    assert acc.value == 100  # materialized once at build
    rows = out.collect()
    assert acc.value == 100  # downstream reads the pin, not the input
    assert [(r["k"], r["n"], r["rank"]) for r in rows] == [
        ("hot", 60, 1), ("warm", 30, 2),
    ]
    assert abs(rows[0]["share"] - 0.6) < 1e-12


def test_skew_report_is_lazy_single_plan(spark):
    """The input must be scanned EXACTLY ONCE, no matter how many
    downstream consumers the operator wires up (the counts pin feeds
    global_rank's build-time offset pass, the ranked pass, and the
    1-row total).  An accumulator-bumping UDF counts input scans: one
    at build (the eager counts pin), zero more at execution — since the
    r6 global_rank rewrite the operator trades build-time laziness for
    a distributed top-k, but never a second scan of the (100 TB)
    input."""
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.profile import skew_report

    acc = spark.sparkContext.accumulator(0)

    def bump(k):
        acc.add(1)
        return k

    bump_udf = F.udf(bump, "string")
    base = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4, "k string"
    ).select(bump_udf("k").alias("k"))

    report = skew_report(base, ["k"], top=1)
    assert acc.value == 10  # the eager counts pin scanned the input once

    rows = report.collect()
    assert [(r["k"], r["n"], r["rank"]) for r in rows] == [("a", 6, 1)]
    assert abs(rows[0]["share"] - 0.6) < 1e-12
    assert acc.value == 10  # ...and execution added NO further scans


def test_feature_correlations_exact_and_pairwise_null(spark):
    import math

    from netflix_data_ingestion_spark.operators.profile import (
        feature_correlations,
    )

    rows = [
        (1.0, 2.0, 5.0),
        (2.0, 4.0, 4.0),
        (3.0, 6.0, 3.0),
        (4.0, 8.0, None),   # enters (a,b) moments, not the c pairs
        (5.0, 10.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr"])
        for r in feature_correlations(df, ["a", "b", "c"]).collect()
    }
    # b = 2a exactly: corr 1; a vs c on the 4 complete rows: perfectly
    # anti-monotonic linear -> -1
    assert got[("a", "b")] == (5, 1.0)
    assert got[("a", "c")][0] == 4 and abs(got[("a", "c")][1] + 1.0) < 1e-9

    def ref_corr(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    bc = ref_corr([200, 400, 600, 1000], [500, 400, 300, 100])
    assert abs(got[("b", "c")][1] - round(bc, 6)) < 1e-9
    # partition invariance: exact integer moments cannot drift
    again = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr"])
        for r in feature_correlations(
            df.repartition(5), ["a", "b", "c"]
        ).collect()
    }
    assert again == got


def test_ols_fit_recovers_known_line(spark):
    from netflix_data_ingestion_spark.operators.profile import ols_fit

    # y = 3x + 7 exactly, plus a NULL row that must be excluded
    rows = [(float(x), 3.0 * x + 7.0) for x in range(1, 21)]
    rows.append((99.0, None))
    df = spark.createDataFrame(rows, "x double, y double")
    got = ols_fit(df, "x", "y").collect()[0]
    assert got["n"] == 20
    assert got["slope"] == 3.0 and got["intercept"] == 7.0
    # partition invariance (exact moments)
    again = ols_fit(df.repartition(7), "x", "y").collect()[0]
    assert (again["slope"], again["intercept"]) == (3.0, 7.0)


def test_ols_fit_per_group_lines(spark):
    from netflix_data_ingestion_spark.operators.profile import ols_fit

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(1, 11)] + [
        ("b", float(x), -1.0 * x + 5.0) for x in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: (r["slope"], r["intercept"]) for r in ols_fit(
        df, "x", "y", key_cols=("g",)).collect()}
    assert got == {"a": (2.0, 1.0), "b": (-1.0, 5.0)}


def test_feature_correlations_per_group(spark):
    rows = [("g1", float(x), 2.0 * x) for x in range(1, 8)] + [
        ("g2", float(x), -3.0 * x + 10) for x in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    from netflix_data_ingestion_spark.operators.profile import (
        feature_correlations,
    )

    got = {r["g"]: r["corr"] for r in feature_correlations(
        df, ["a", "b"], key_cols=("g",)).collect()}
    assert got == {"g1": 1.0, "g2": -1.0}

"""Exact AUC-ROC (operators/metrics.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.metrics import auc_roc


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "label boolean, score double")
    return auc_roc(df, "label", "score", scale=1).collect()[0]


def test_auc_matches_sklearn_free_replica(spark):
    """Tie-aware python replica (pair counting) on a mixed corpus."""
    # scores integral so the scale=1 fixed-point is the identity and
    # the raw-value python replica is exact
    rows = [(True, 3.0), (True, 2.0), (True, 2.0), (False, 2.0),
            (False, 1.0), (False, 0.0), (True, 1.0), (None, 9.0),
            (True, None)]
    r = _auc(spark, rows)
    clean = [(y, s) for y, s in rows if y is not None and s is not None]
    pos = [s for y, s in clean if y]
    neg = [s for y, s in clean if not y]
    u = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == round(u / (len(pos) * len(neg)), 6)


def test_auc_perfect_random_and_degenerate(spark):
    perfect = [(True, float(10 + i)) for i in range(5)] + [
        (False, float(i)) for i in range(5)
    ]
    assert _auc(spark, perfect)["auc"] == 1.0
    all_tied = [(True, 1.0)] * 3 + [(False, 1.0)] * 3
    assert _auc(spark, all_tied)["auc"] == 0.5
    one_class = [(True, float(i)) for i in range(4)]
    assert _auc(spark, one_class)["auc"] is None


def test_auc_partition_invariant(spark):
    rows = [(i % 3 == 0, float((i * 7) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "label boolean, score double")
    a = auc_roc(df, "label", "score", scale=1).collect()[0]["auc"]
    b = auc_roc(df.repartition(17), "label", "score", scale=1).collect()[0]["auc"]
    assert a == b


def test_classification_report_exact_counts(spark):
    from netflix_data_ingestion_spark.operators.metrics import (
        classification_report,
    )

    rows = [(True, 9.0), (True, 1.0), (False, 8.0), (False, 2.0),
            (True, 5.0), (None, 9.0), (False, None)]
    df = spark.createDataFrame(rows, "label boolean, score double")
    r = classification_report(df, "label", "score", threshold=5.0,
                              scale=1).collect()[0]
    # predictions at >= 5: T(9)+, T(1)-, F(8)+, F(2)-, T(5)+
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 1, 1, 1)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(4 / 6, 6)


def test_classification_report_degenerate(spark):
    from netflix_data_ingestion_spark.operators.metrics import (
        classification_report,
    )

    df = spark.createDataFrame([(False, 1.0)], "label boolean, score double")
    r = classification_report(df, "label", "score", 5.0, scale=1).collect()[0]
    assert r["precision"] is None and r["recall"] is None and r["f1"] is None

"""Deterministic augmentation (operators/augment.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.augment import (
    char_dropout,
    token_mask,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_dropout_is_deterministic_and_subsequence(spark):
    df = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog" * 5), (2, "")],
    )
    a = {r["doc_id"]: r["aug_text"] for r in char_dropout(df).collect()}
    b = {
        r["doc_id"]: r["aug_text"]
        for r in char_dropout(df.repartition(7)).collect()
    }
    assert a == b  # partition-invariant
    assert a[2] == ""
    orig = "the quick brown fox jumps over the lazy dog" * 5
    aug = a[1]
    assert 0 < len(aug) < len(orig)
    # augmented text is a subsequence of the original
    it = iter(orig)
    assert all(c in it for c in aug)


def test_char_dropout_rate_near_expected(spark):
    text = "x" * 13000
    df = _docs(spark, [(42, text)])
    aug = char_dropout(df).collect()[0]["aug_text"]
    dropped = 13000 - len(aug)
    # ~1/13 expected (1000); md5 coins are iid-ish — wide tolerance
    assert 800 <= dropped <= 1200


def test_char_dropout_differs_by_doc_id(spark):
    text = "identical text for both documents, long enough to differ"
    df = _docs(spark, [(1, text), (2, text)])
    out = {r["doc_id"]: r["aug_text"] for r in char_dropout(df).collect()}
    assert out[1] != out[2]  # coin keyed on (id, pos), not content


def test_token_mask_counts_and_determinism(spark):
    df = _docs(
        spark,
        [(7, "alpha beta gamma delta " * 40), (8, ""), (9, None)],
    )
    out = {r["doc_id"]: r for r in token_mask(df).collect()}
    assert out[8]["masked_tokens"] == [] and out[8]["n_masked"] == 0
    assert out[9]["masked_tokens"] == [] and out[9]["n_masked"] == 0
    toks = out[7]["masked_tokens"]
    assert len(toks) == 160
    n_masked = sum(1 for t in toks if t == "<mask>")
    assert n_masked == out[7]["n_masked"]
    assert 160 // 8 // 3 <= n_masked <= 160 // 8 * 3  # ~12.5% wide band
    # unmasked positions carry the original pretokens
    originals = ["alpha", "beta", "gamma", "delta"] * 40
    assert all(
        t == o for t, o in zip(toks, originals) if t != "<mask>"
    )
    again = {r["doc_id"]: r for r in token_mask(df.repartition(5)).collect()}
    assert again[7]["masked_tokens"] == toks

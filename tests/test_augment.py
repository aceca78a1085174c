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


def test_fim_reconstructs_and_gates(spark):
    """FIM property: stripping the sentinels and reassembling
    prefix+middle+suffix must recover the original text exactly, for
    every transformed doc; untransformed docs pass through verbatim;
    the gate hits ~1/2 of docs; short/NULL docs never transform."""
    from netflix_data_ingestion_spark.operators.augment import fim_transform

    rows = [(i, f"doc {i} body text with some length {i * 7}") for i in range(200)]
    rows += [(900, "a"), (901, ""), (902, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(df).collect()}
    originals = dict(rows)
    n_fim = 0
    for doc_id, r in out.items():
        if r["is_fim"]:
            n_fim += 1
            t = r["out_text"]
            assert t.startswith("<PRE>")
            pre, rest = t[5:].split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
            assert pre + mid + suf == originals[doc_id]
        else:
            assert r["out_text"] == originals[doc_id]
    assert not out[900]["is_fim"] and not out[901]["is_fim"]
    assert not out[902]["is_fim"] and out[902]["out_text"] is None
    assert 60 <= n_fim <= 140  # ~100 of 200 eligible at rate 1/2


def test_fim_is_deterministic_across_partitioning(spark):
    from netflix_data_ingestion_spark.operators.augment import fim_transform

    rows = [(i, f"text body number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["out_text"] for r in fim_transform(df).collect()}
    b = {
        r["doc_id"]: r["out_text"]
        for r in fim_transform(df.repartition(7)).collect()
    }
    assert a == b


def test_span_corrupt_reconstructs(spark):
    """Denoising-pair property: substituting each target span back at
    its sentinel position in inputs recovers the original token
    sequence exactly; n_spans matches the sentinel count."""
    import re

    from netflix_data_ingestion_spark.operators.augment import span_corrupt

    rows = [
        (i, f"alpha beta gamma delta {i} epsilon zeta eta theta iota")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corrupt(df, mask_pct=30).collect()}
    originals = dict(rows)
    for doc_id, r in out.items():
        spans = {}
        parts = re.split(r"(<extra_id_\d+>)", r["targets"])
        cur = None
        for p in parts:
            p = p.strip()
            if not p:
                continue
            if p.startswith("<extra_id_"):
                cur = p
                spans[cur] = []
            else:
                spans[cur].extend(p.split())
        assert len(spans) == r["n_spans"]
        rebuilt = []
        for tok in r["inputs"].split():
            if tok.startswith("<extra_id_"):
                rebuilt.extend(spans[tok])
            else:
                rebuilt.append(tok)
        want = [t for t in originals[doc_id].lower().split() if t]
        assert rebuilt == want, doc_id


def test_span_corrupt_edge_docs(spark):
    from netflix_data_ingestion_spark.operators.augment import span_corrupt

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "!!!")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_corrupt(df).collect()}
    assert out[1]["n_spans"] == 0 and out[1]["inputs"] == ""
    assert out[2]["n_spans"] is None and out[2]["inputs"] is None
    assert out[3]["n_spans"] == 0 and out[3]["inputs"] == ""

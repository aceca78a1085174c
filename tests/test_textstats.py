"""Text analysis: token stats, quality, lang-ID, winnowing fingerprints."""

from __future__ import annotations

import pytest

from netflix_data_ingestion_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "el perro corre en el parque y la casa es grande"),
            (3, "12345 67890 !!!"),
            (4, "the cat sat on the mat"),  # dup of 1 for fingerprint test
        ],
        "doc_id int, text string",
    )


def test_token_stats(spark, docs):
    out = {r["doc_id"]: r for r in textstats.token_stats(docs, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 6
    assert out[1]["n_chars"] == 22
    # (3+3+3+2+3+3)/6
    assert abs(out[1]["avg_token_len"] - 17 / 6) < 1e-5


def test_quality_score_ranges(spark, docs):
    out = {r["doc_id"]: r for r in textstats.quality_score(docs, "doc_id", "text").collect()}
    assert out[1]["alpha_ratio"] > 0.7
    assert out[3]["alpha_ratio"] == 0.0
    assert out[1]["quality_score"] > out[3]["quality_score"]
    # doc 1: stopwords 'the' x2, 'on' x0 (not in list) -> 2/6
    assert abs(out[1]["stopword_ratio"] - 2 / 6) < 1e-5


def test_lang_id(spark, docs):
    out = {
        r["doc_id"]: r["predicted_lang"]
        for r in textstats.lang_id(docs, "doc_id", "text").collect()
    }
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"  # no lexicon hits


def test_winnow_fingerprint_deterministic(spark, docs):
    out = {r["doc_id"]: r for r in textstats.winnow_fingerprint(docs, "doc_id", "text").collect()}
    # identical docs -> identical fingerprints
    assert out[1]["fp_digest"] == out[4]["fp_digest"]
    assert out[1]["n_fingerprints"] == out[4]["n_fingerprints"]
    assert out[1]["n_fingerprints"] >= 1
    # doc 3 has 3 tokens -> exactly 1 trigram, window needs 4 positions -> absent
    assert 3 not in out

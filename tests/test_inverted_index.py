from __future__ import annotations

from netflix_data_ingestion_spark.operators.textstats import inverted_index


def _docs(spark):
    rows = [
        (3, "apple banana apple"),  # repeated term counts once per doc
        (1, "apple cherry"),
        (2, "banana!  Banana, cherry"),
        (4, ""),  # empty doc contributes nothing
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_sorted_and_df_is_per_doc(spark):
    out = {
        r["term"]: (r["doc_freq"], r["postings"])
        for r in inverted_index(_docs(spark), "doc_id", "text").collect()
    }
    assert out["apple"] == (2, "1,3")
    assert out["banana"] == (2, "2,3")  # case/punct normalized, deduped
    assert out["cherry"] == (2, "1,2")
    assert len(out) == 3


def test_min_df_cut(spark):
    df = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(5, "unique_term")], ["doc_id", "text"]
        )
    )
    terms = {
        r["term"]
        for r in inverted_index(df, "doc_id", "text", min_df=2).collect()
    }
    assert "unique_term" not in terms
    assert "apple" in terms


def test_max_df_ratio_stopword_cut(spark):
    # "common" appears in all 4 docs -> dropped at ratio 0.75
    rows = [(i, f"common word{i}") for i in range(4)]
    df = _docs(spark).sparkSession.createDataFrame(rows, ["doc_id", "text"])
    terms = {
        r["term"]
        for r in inverted_index(
            df, "doc_id", "text", max_df_ratio=0.75
        ).collect()
    }
    assert "common" not in terms
    assert {"word0", "word1", "word2", "word3"} <= terms

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


def test_repetition_ratio(spark):
    from netflix_data_ingestion_spark.operators.textstats import (
        repetition_ratio,
    )

    docs = [
        (1, "a b c a b c a b c"),     # heavy 3-gram repetition
        (2, "one two three four five six"),  # all distinct
        (3, "x y"),                   # too short -> dropped
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["doc_id"]: r for r in repetition_ratio(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    # doc1: 7 grams, 3 distinct (abc, bca, cab) -> 4/7 repeated
    assert out[1]["n_grams"] == 7 and out[1]["n_distinct_grams"] == 3
    assert abs(out[1]["dup_ratio"] - 4 / 7) < 1e-12
    assert out[2]["dup_ratio"] == 0.0


def test_contamination(spark):
    from netflix_data_ingestion_spark.operators.textstats import contamination

    corpus = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "totally unrelated words appear in this document here"),
        (3, "quick brown fox jumps over nothing else matters"),
    ]
    bench = [(100, "the quick brown fox jumps over a fence")]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    bdf = spark.createDataFrame(bench, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in contamination(df, bdf, "doc_id", "text", n=5).collect()
    }
    assert len(out) == 3  # one row per input doc, zero-overlap included
    assert out[1]["contaminated"] and out[1]["n_overlap_grams"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap_grams"] == 0
    assert out[3]["contaminated"]  # shares 'quick brown fox jumps over'


def test_tfidf_top_terms(spark):
    from netflix_data_ingestion_spark.operators.textstats import (
        tfidf_top_terms,
    )

    docs = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared shared"),
        (3, "cherry apple shared"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 2 for v in by_doc.values())
    # doc1: apple tf=2 df=2 -> 2*3/2=3.0 beats banana (1*3/2) and shared (1*3/3)
    top1 = by_doc[1][0]
    assert (top1["term"], top1["tf"], top1["df"], top1["score"]) == (
        "apple", 2, 2, 3.0,
    )
    # doc2: 'shared' tf=2 df=3 -> 2.0 tops banana/cherry (1*3/2 = 1.5)
    top2 = by_doc[2][0]
    assert (top2["term"], top2["score"]) == ("shared", 2.0)
    # doc3: all tf=1 -> rarest-term order, tie broken lexicographically
    assert [r["term"] for r in by_doc[3]] == ["apple", "cherry"]
    # ranks are 1..k per doc
    assert [r["rank"] for r in by_doc[2]] == [1, 2]


def test_chunk_text_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = sorted(
        textstats.chunk_text(df, "doc_id", "text", chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2: starts 1,3,5,7,9 -> 5 chunks, last is a 2-token tail
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 4, 2]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t2 t3 t4 t5"   # 2-token overlap
    assert out[4]["chunk_text"] == "t8 t9"


def test_chunk_text_zero_token_doc_yields_no_rows(spark):
    """Empty / punctuation-only documents produce ZERO chunks (not a
    crash: sequence(1, 0) throws in ANSI Spark unless short-circuited)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "!!! ??? ..."), (3, None), (4, "one two")],
        "doc_id int, text string",
    )
    out = textstats.chunk_text(df, "doc_id", "text", chunk_tokens=4, overlap=2).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_chunk_text_rejects_bad_overlap():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        textstats.chunk_text(None, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_bpe_pretokenize_classes_and_counts(spark):
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.textstats import (
        bpe_pretokenize,
        bpe_token_stats,
    )

    df = spark.createDataFrame(
        [(1, "Hello's  world, 123 foo-bar!"), (2, ""), (3, "...")],
        ["doc_id", "text"],
    )
    toks = df.select(
        "doc_id", bpe_pretokenize(F.col("text")).alias("t")
    ).collect()
    by_id = {r["doc_id"]: r["t"] for r in toks}
    # contraction split, punctuation runs kept, whitespace dropped
    assert by_id[1] == [
        "Hello", "'s", "world", ",", "123", "foo", "-", "bar", "!",
    ]
    assert by_id[2] == []
    assert by_id[3] == ["..."]

    stats = {
        r["doc_id"]: (r["n_tokens"], r["n_word"], r["n_number"], r["n_symbol"])
        for r in bpe_token_stats(df, "doc_id", "text").collect()
    }
    assert stats[1] == (9, 5, 1, 3)  # 's counts as a word token
    assert stats[2] == (0, 0, 0, 0)
    assert stats[3] == (1, 0, 0, 1)


def test_bigram_lm_counts_kn_ingredients(spark):
    from netflix_data_ingestion_spark.operators.textstats import (
        bigram_lm_counts,
    )

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["ctx_total"], r["cont_w2"])
        for r in bigram_lm_counts(df, "doc_id", "text").collect()
    }
    # counts: ab x2 (doc1), ba x1, bc x2 (doc1 + doc2); single-token and
    # empty docs contribute nothing
    assert got == {
        ("a", "b"): (2, 2, 1),   # ctx a->* total 2; contexts of b = {a}
        ("b", "a"): (1, 3, 1),   # ctx b->* total 3; contexts of a = {b}
        ("b", "c"): (2, 3, 1),   # contexts of c = {b}
    }


def test_vocab_growth_first_seen_accounting(spark):
    from netflix_data_ingestion_spark.operators.textstats import vocab_growth

    df = spark.createDataFrame(
        [
            (0, "a b c"),        # bucket 0: introduces a,b,c
            (1, "b c d"),        # +d
            (10, "a d e"),       # bucket 10: +e
            (11, ""),            # empty doc introduces nothing
            (20, "a b"),         # bucket 20: nothing new -> absent
        ],
        "doc_id long, text string",
    )
    got = {
        r["bucket"]: (r["new_terms"], r["vocab_size"])
        for r in vocab_growth(df, "doc_id", "text", bucket_size=10).collect()
    }
    assert got == {0: (4, 4), 10: (1, 5)}


def test_bm25_ranks_relevant_docs_first(spark):
    from netflix_data_ingestion_spark.operators.textstats import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),     # high tf for 'spark'
            (2, "spark shuffle " + "filler " * 50),  # long doc: tf dampened
            (3, "completely unrelated words here"),
            (4, "spark"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score_micro"] for r in bm25_scores(
        df, "doc_id", "text", ["spark"]).collect()}
    # non-matching doc absent; repeated-term doc beats the long diluted
    # one; short exact match beats the diluted long doc too
    assert 3 not in got
    assert got[1] > got[2] and got[4] > got[2]
    # partition invariance of the exact integer micro-unit sum
    again = {r["doc_id"]: r["score_micro"] for r in bm25_scores(
        df.repartition(7), "doc_id", "text", ["spark"]).collect()}
    assert again == got


def test_dup_spans_cross_doc_only_and_merging(spark):
    """A shared 6-token phrase yields one merged span per doc (two
    overlapping 5-gram starts fold together); a phrase repeated only
    WITHIN one doc does not qualify; clean docs produce no rows."""
    from netflix_data_ingestion_spark.operators.textstats import dup_spans

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three"),
        (2, f"{shared} nine ten"),
        (3, "self self self self self self self self self self unique"),
        (4, "totally unrelated content with no shared phrases at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in dup_spans(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    # doc 1: shared phrase occupies tokens 2..7 -> starts {2,3} merge
    assert out[1] == (2, 7, 6)
    # doc 2: tokens 0..5
    assert out[2] == (0, 5, 6)
    # intra-doc repetition (doc 3) and clean doc 4: no spans
    assert 3 not in out and 4 not in out


def test_remove_dup_spans_cuts_and_passes_through(spark):
    from netflix_data_ingestion_spark.operators.textstats import (
        remove_dup_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three"),
        (2, f"{shared} nine ten"),
        (3, shared),                       # the WHOLE doc is the span
        (4, "clean document nothing shared here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in remove_dup_spans(df, "doc_id", "text", n=5, min_docs=2)
        .collect()
    }
    assert out[1] == ("one two three", 6)
    assert out[2] == ("nine ten", 6)
    assert out[3] == ("", 6)               # cut to nothing, still a row
    assert out[4] == ("clean document nothing shared here at all", 0)

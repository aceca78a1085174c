from __future__ import annotations

from netflix_data_ingestion_spark.operators.linededup import (
    remove_common_segments,
    segment_doc_frequency,
)


def _corpus(spark):
    rows = [
        (1, "COOKIE BANNER\nreal content one\nCOOKIE BANNER\nfooter nav"),
        (2, "COOKIE BANNER\nreal content two\nfooter nav"),
        (3, "COOKIE BANNER\nunique paragraph three\nfooter nav"),
        (4, "COOKIE BANNER\nfooter nav"),  # all-boilerplate doc
        (5, "totally original essay"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segment_doc_frequency(spark):
    freq = {
        r["segment"]: r["doc_freq"]
        for r in segment_doc_frequency(
            _corpus(spark), "doc_id", "text"
        ).collect()
    }
    assert freq["COOKIE BANNER"] == 4  # distinct docs, not occurrences
    assert freq["footer nav"] == 4
    assert freq["real content one"] == 1


def test_remove_common_segments_preserves_order_and_counts(spark):
    out = {
        r["doc_id"]: r
        for r in remove_common_segments(
            _corpus(spark), "doc_id", "text", min_docs=3
        ).collect()
    }
    assert len(out) == 5
    assert out[1]["clean_text"] == "real content one"
    assert out[1]["n_segments"] == 4  # both banner copies counted
    assert out[1]["n_removed"] == 3
    assert out[2]["clean_text"] == "real content two"
    assert out[3]["clean_text"] == "unique paragraph three"
    # all-boilerplate doc survives as an empty row, not a dropped row
    assert out[4]["clean_text"] == ""
    assert out[4]["n_removed"] == 2
    # untouched doc round-trips byte-identical
    assert out[5]["clean_text"] == "totally original essay"
    assert out[5]["n_removed"] == 0


def test_remove_common_segments_multiline_order(spark):
    # surviving segments keep original relative order even when the
    # removed ones are interleaved
    df = spark.createDataFrame(
        [(1, "b\nz1\nb\nz2\nb\nz3"), (2, "b"), (3, "b")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_common_segments(
            df, "doc_id", "text", min_docs=3
        ).collect()
    }
    assert out[1] == "z1\nz2\nz3"


def test_regex_delimiter_is_literal(spark):
    # "." must split literally, not as a regex wildcard
    df = spark.createDataFrame([(1, "a.b.a"), (2, "a.c")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_common_segments(
            df, "doc_id", "text", delim=".", min_docs=2
        ).collect()
    }
    assert out[1] == "b"
    assert out[2] == "c"


def test_removal_join_is_broadcast(spark):
    plan = (
        remove_common_segments(_corpus(spark), "doc_id", "text", min_docs=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the boilerplate dictionary must broadcast: the exploded corpus is
    # never shuffled for the removal step
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

"""Cross-document window packing + distributed exclusive prefix sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.keys import prefix_sum_ranged
from netflix_data_ingestion_spark.operators.packing import pack_windows


def test_prefix_sum_ranged_matches_serial_and_partition_invariant(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["off"]
        for r in prefix_sum_ranged(df, ["k"], "v", "off").collect()
    }
    acc, expect = 0, {}
    for k, v in sorted(rows):
        expect[k] = acc
        acc += v
    assert got == expect
    # exclusive: first row offset 0
    assert got[0] == 0
    # partition invariance
    got2 = {
        r["k"]: r["off"]
        for r in prefix_sum_ranged(
            df.repartition(17), ["k"], "v", "off"
        ).collect()
    }
    assert got2 == expect


def test_pack_windows_exact_fill_and_doc_coverage(spark):
    # docs with 5, 12, 3, 0, 7 tokens; W=8 -> stream of 27 tokens in
    # 4 windows (last partial)
    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    df = spark.createDataFrame(
        [
            (1, words(5, "a")),
            (2, words(12, "b")),
            (3, words(3, "c")),
            (4, ""),
            (5, words(7, "d")),
        ],
        "doc_id long, text string",
    )
    out = pack_windows(df, "doc_id", "text", window=8).collect()
    per_window = {}
    per_doc = {}
    for r in out:
        per_window.setdefault(r["window_id"], 0)
        per_window[r["window_id"]] += r["n_toks"]
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_start_tok"], r["n_toks"])
        )
    # every window exactly full except the tail; total = 27
    assert per_window == {0: 8, 1: 8, 2: 8, 3: 3}
    # token-free doc absent; every other doc fully covered by
    # contiguous slices starting at 0
    assert 4 not in per_doc
    for doc, n in [(1, 5), (2, 12), (3, 3), (5, 7)]:
        spans = sorted(per_doc[doc])
        assert spans[0][0] == 0
        pos = 0
        for start, ln in spans:
            assert start == pos and ln > 0
            pos += ln
        assert pos == n
    # doc 2 (12 tokens at offsets 5..16) straddles windows 0, 1, 2
    # with slice lengths 3 + 8 + 1
    assert sorted(ln for _, ln in per_doc[2]) == [1, 3, 8]

"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash."""

from __future__ import annotations

import pytest

from netflix_data_ingestion_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (4, "completely different words with zero overlap here whatsoever"),
    (5, "another unrelated document about spark query engines"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_exact_dedup_groups(docs):
    out = {
        r["doc_id"]: (r["canonical_id"], r["group_size"])
        for r in dedup.exact_dedup(docs, "doc_id", "text").collect()
    }
    assert out[1] == (1, 2)
    assert out[2] == (1, 2)
    assert out[3] == (3, 1)


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs  # near dup: 6/8 shared 3-gram shingles
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_candidates_cover_high_jaccard(docs):
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidate_pairs(
            docs, "doc_id", "text", n=3, num_hashes=16, bands=4
        ).collect()
    }
    # identical docs share every band
    assert (1, 2) in cands
    # unrelated docs should not collide (16 md5 minhashes)
    assert (4, 5) not in cands


def test_simhash_properties(docs):
    fp = {
        r["doc_id"]: r["simhash64"]
        for r in dedup.simhash(docs, "doc_id", "text").collect()
    }
    assert all(len(v) == 16 for v in fp.values())  # 64 bits = 16 hex chars
    assert fp[1] == fp[2]  # identical text -> identical fingerprint
    assert fp[1] != fp[4]  # different text -> different fingerprint

    def hamming(a: str, b: str) -> int:
        return sum(
            bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b)
        )

    # near-dup closer in hamming space than unrelated docs
    assert hamming(fp[1], fp[3]) < hamming(fp[1], fp[4])


def test_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "exactly three words")],
        "doc_id int, text string",
    )
    # shingle-based ops must not crash on docs shorter than n
    assert dedup.ngram_jaccard_pairs(docs, "doc_id", "text").count() == 0
    fps = dedup.simhash(docs, "doc_id", "text").count()
    assert fps == 3  # empty doc has no tokens -> no fingerprint row


def test_cosine_near_dup_pairs(spark):
    from netflix_data_ingestion_spark.operators.dedup import cosine_near_dup_pairs

    vecs = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),       # exact dup of 0 -> cosine 1.0
        (2, [0.9, 0.1]),       # near-dup of 0/1
        (3, [0.0, 1.0]),       # orthogonal -> excluded at 0.5
        (4, [-1.0, 0.0]),      # negative -> excluded
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]): r["cosine_sim"]
           for r in cosine_near_dup_pairs(df, threshold=0.5).collect()}
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert out[(0, 1)] == 1.0
    import math
    expected = round(0.9 / math.sqrt(0.9**2 + 0.1**2), 6)
    assert abs(out[(0, 2)] - expected) < 1e-9
    # pairs are upper-triangle only
    assert all(a < b for a, b in out)


def test_hash_split_stability(spark):
    """Assignments must not move when the corpus grows or ratios change
    only at adjacent cut points."""
    from netflix_data_ingestion_spark.operators.split import hash_split

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", splits).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", splits).collect()}
    assert all(b[k] == v for k, v in a.items())  # growth never remaps
    # widening train only promotes val/test rows INTO train
    c = {r["doc_id"]: r["split"]
         for r in hash_split(big, "doc_id", {"train": 0.9, "test": 0.1}).collect()}
    for k, v in b.items():
        if v == "train":
            assert c[k] == "train"
    # roughly proportional
    from collections import Counter
    cnt = Counter(b.values())
    assert 700 < cnt["train"] < 900


def test_near_dup_at_scale_matches_all_pairs(spark):
    """LSH-candidates + exact verify must find the same pairs as the
    quadratic all-pairs scorer on the testdata corpus (planted near-dups
    are at J~0.99 where 4x4 band recall is ~0.999998)."""
    from netflix_data_ingestion_spark.operators.dedup import (
        near_dup_pairs_at_scale,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8)
    scaled = near_dup_pairs_at_scale(docs, "doc_id", "text", 3, 0.8)
    key = lambda r: (r["id_a"], r["id_b"], r["intersection"], round(r["jaccard"], 9))
    assert sorted(map(key, exact.collect())) == sorted(map(key, scaled.collect()))


def test_cosine_scale_subset_of_all_pairs(spark):
    """Every pair the LSH-bucketed production path emits must appear in
    the all-pairs audit twin with the IDENTICAL rounded cosine (the
    verify stage is exact; only recall differs)."""
    from netflix_data_ingestion_spark.operators.dedup import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_at_scale,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    audit = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    scale = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_near_dup_pairs_at_scale(
            emb, threshold=0.4, planes=6, tables=8, dim=64
        ).collect()
    }
    assert scale  # OR-amplified recall must find a nonempty subset
    assert set(scale) <= set(audit)
    assert all(audit[k] == v for k, v in scale.items())


def test_lsh_bucket_null_gating(spark):
    """NULL / empty / mis-sized vectors must drop out (NULL bucket), not
    collapse into the all-'0' bucket and cross-join every bad row."""
    from netflix_data_ingestion_spark.operators.dedup import (
        cosine_lsh_candidate_pairs,
    )
    from netflix_data_ingestion_spark.operators.similarity import lsh_bucket

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 0
        (2, None),                    # NULL vector
        (3, []),                      # empty vector
        (4, [1.0, 0.0]),              # mis-sized (dim=4 declared)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    buckets = lsh_bucket(df, planes=4, dim=4)
    assert {r["vec_id"] for r in buckets.collect()} == {0, 1}
    cands = {
        (r["id_a"], r["id_b"])
        for r in cosine_lsh_candidate_pairs(
            df, planes=4, tables=4, dim=4
        ).collect()
    }
    assert cands == {(0, 1)}
    # dim=None path: NULL/empty still drop, the 2-dim row now buckets
    assert {r["vec_id"] for r in lsh_bucket(df, planes=4).collect()} == {
        0, 1, 4,
    }


def test_semantic_dedup_subset_of_all_pairs_and_cluster_complete(spark):
    """SemDeDup pairs must appear in the all-pairs audit twin with the
    IDENTICAL rounded cosine, and within a single k-means cluster the
    recall must be total (the only misses allowed are cross-cluster)."""
    from netflix_data_ingestion_spark.operators.dedup import (
        cosine_near_dup_pairs,
        semantic_dedup_pairs,
    )
    from netflix_data_ingestion_spark.operators.kmeans import kmeans_train

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    audit = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    sem = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", k=4, iters=1, threshold=0.4
        ).collect()
    }
    assert sem
    assert set(sem) <= set(audit)
    assert all(audit[k] == v for k, v in sem.items())
    # cluster-completeness: every audit pair whose endpoints share a
    # cluster must have been found
    cl = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_train(
            emb, "vec_id", "embedding", k=4, iters=1
        ).collect()
    }
    same_cluster = {
        p for p in audit if cl[p[0]] == cl[p[1]]
    }
    assert same_cluster <= set(sem)


def test_incremental_candidates_equal_filtered_full_corpus(spark):
    """Splitting the corpus into 'historical' + 'new batch' and probing
    the snapshot must produce EXACTLY the full-corpus LSH candidates
    that touch the new batch (determinism of the md5 family makes the
    incremental path inherit the batch path's oracle), and the updated
    snapshot must equal banding the whole corpus."""
    from netflix_data_ingestion_spark.operators.dedup import (
        incremental_near_dup_candidates,
        minhash_band_table,
        minhash_lsh_candidate_pairs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    old = docs.where("doc_id % 3 != 0")
    new = docs.where("doc_id % 3 = 0")
    snapshot = minhash_band_table(old, "doc_id", "text")

    pairs, updated = incremental_near_dup_candidates(new, snapshot)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    new_ids = {r["doc_id"] for r in new.collect()}
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == want and got  # non-trivial on the near-dup testdata

    a = sorted(map(tuple, updated.collect()))
    b = sorted(
        map(tuple, minhash_band_table(docs, "doc_id", "text").collect())
    )
    assert a == b


def test_containment_catches_subset_docs_jaccard_misses(spark):
    from netflix_data_ingestion_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    words = [f"w{i}" for i in range(120)]
    long_doc = " ".join(words)                 # 118 3-gram shingles
    short_doc = " ".join(words[:12])           # 10 shingles, all inside
    other = " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)],
        "doc_id long, text string",
    )
    got = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=5
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["containment"] == 1.0 and got[0]["intersection"] == 10
    # symmetric Jaccard misses this pair at any usable threshold
    jac = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5
    ).collect()
    assert (1, 2) not in [(r["id_a"], r["id_b"]) for r in jac]


def test_containment_blocking_blind_spot_documented(spark):
    from netflix_data_ingestion_spark.operators.dedup import containment_pairs

    # a shingle shared by MORE than max_df docs never generates pairs:
    # six identical docs with max_df=5 -> blocked (the boilerplate
    # blind spot the docstring owns)
    df = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(6)], "doc_id long, text string"
    )
    got = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=5
    ).collect()
    assert got == []
    # at max_df >= 6 the same corpus produces all 15 pairs
    got6 = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=6
    ).collect()
    assert len(got6) == 15


def test_exact_dedup_canonical_groups_variants(spark):
    from netflix_data_ingestion_spark.operators.dedup import (
        exact_dedup_canonical,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD"),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_dedup_canonical(df, "doc_id", "text").collect()}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)


def test_simhash_near_dup_pairs_matches_bruteforce(spark):
    import random

    from netflix_data_ingestion_spark.operators.dedup import (
        simhash,
        simhash_near_dup_pairs,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(rng.choices(vocab, k=25))))
    # planted exact duplicate (Hamming 0) and a light edit
    rows.append((100, rows[0][1]))
    rows.append((101, rows[0][1] + " extraword"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    prints = {r["doc_id"]: r["simhash64"] for r in simhash(
        df, "doc_id", "text").collect()}

    def ham(a, b):
        return sum(
            bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b)
        )

    expect = {
        (a, b): ham(prints[a], prints[b])
        for a in prints
        for b in prints
        if a < b and ham(prints[a], prints[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(df, "doc_id", "text").collect()
    }
    # block-pigeonhole recall is TOTAL at max_hamming <= 3: exact match
    assert got == expect
    assert got[(0, 100)] == 0          # exact dup found at distance 0
    # guard: the pigeonhole guarantee refuses larger radii
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=4)


def test_prefix_jaccard_equals_all_pairs(docs):
    """Prefix filtering is exact: identical pair set to the quadratic
    all-pairs join on the same corpus, thresholds aligned (0.8 = 4/5)."""
    ap = sorted(
        (r["id_a"], r["id_b"], r["intersection"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    )
    pf = sorted(
        (r["id_a"], r["id_b"], r["intersection"], r["jaccard"])
        for r in dedup.prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, t_num=4, t_den=5
        ).collect()
    )
    assert ap == pf


def test_prefix_jaccard_threshold_boundary(spark):
    """J == tau exactly is INCLUDED (integer boundary arithmetic);
    just-below is excluded; empty/short docs produce no pairs."""
    rows = [
        (1, "a b c d e f"),        # 4 shingles
        (2, "a b c d e f g"),      # 5 shingles, superset -> J = 4/5
        (3, "a b c d e f g h"),    # 6 shingles, superset of 1 -> J = 4/6
        (4, ""),                   # zero tokens
        (5, "x y"),                # < n tokens -> zero shingles
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_jaccard_pairs(
            df, "doc_id", "text", n=3, t_num=4, t_den=5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 0.8
    assert (1, 3) not in got
    assert all(4 not in p and 5 not in p for p in got)


def test_prefix_jaccard_rejects_bad_threshold(docs):
    with pytest.raises(ValueError):
        dedup.prefix_jaccard_pairs(docs, "doc_id", "text", t_num=5, t_den=5)


def test_attach_pair_arrays_and_overlap_stats(spark):
    """The shared verify helpers (r12): two-sided array attach preserves
    side identity (arr_a from id_a, arr_b from id_b), and the Generate-
    barrier stats struct carries exact intersection / sizes / union."""
    from pyspark.sql import functions as F

    arrs = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["b", "c", "d"]), (3, ["x"])],
        "jid int, sh_arr array<string>",
    ).localCheckpoint(eager=True)
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a int, id_b int"
    )
    paired = dedup.attach_pair_arrays(cand, arrs)
    got = {
        (r["id_a"], r["id_b"]): (sorted(r["arr_a"]), sorted(r["arr_b"]))
        for r in paired.collect()
    }
    assert got[(1, 2)] == (["a", "b", "c"], ["b", "c", "d"])
    assert got[(1, 3)] == (["a", "b", "c"], ["x"])
    stats = {
        (r["id_a"], r["id_b"]): (r["i"], r["sa"], r["sb"], r["u"])
        for r in dedup.pair_overlap_stats(paired)
        .select("id_a", "id_b", F.col("__v.*"))
        .collect()
    }
    assert stats[(1, 2)] == (2, 3, 3, 4)
    assert stats[(1, 3)] == (0, 3, 1, 4)

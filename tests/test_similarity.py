"""Similarity search: brute-force cosine top-k + LSH-bucketed variant."""

from __future__ import annotations

import math

import pytest

from netflix_data_ingestion_spark.operators import similarity

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [1.0, 0.0, 0.0]),      # identical to 0
    (2, [0.9, 0.1, 0.0]),      # close to 0
    (3, [0.0, 1.0, 0.0]),      # orthogonal to 0
    (4, [-1.0, 0.0, 0.0]),     # opposite of 0
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>"
    )


def test_brute_force_ranking(corpus):
    queries = corpus.filter("vec_id = 0")
    out = similarity.brute_force_topk(corpus, queries, k=4).collect()
    ranked = [
        r["neighbor_id"]
        for r in sorted(out, key=lambda r: (-r["cosine_sim"], r["neighbor_id"]))
    ]
    assert ranked == [1, 2, 3, 4]
    sims = {r["neighbor_id"]: r["cosine_sim"] for r in out}
    assert sims[1] == 1.0
    assert sims[3] == 0.0
    assert sims[4] == -1.0
    expected_2 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(sims[2] - expected_2) < 1e-5


def test_k_limit_and_self_exclusion(corpus):
    queries = corpus.filter("vec_id = 0")
    out = similarity.brute_force_topk(corpus, queries, k=2).collect()
    assert len(out) == 2
    assert all(r["neighbor_id"] != 0 for r in out)


def test_lsh_results_subset_of_exact_scores(corpus):
    queries = corpus.filter("vec_id = 0")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in similarity.brute_force_topk(corpus, queries, k=4).collect()
    }
    approx = similarity.lsh_topk(corpus, queries, k=4, planes=4).collect()
    # every LSH hit carries the same (exact) cosine as the brute-force path
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert r["cosine_sim"] == exact[key]
    # identical vectors always share every bucket
    assert any(r["neighbor_id"] == 1 for r in approx)


def test_ivf_centroids_deterministic(corpus):
    cent = similarity.ivf_centroids(corpus, nlist=2).collect()
    assert sorted(r["list_id"] for r in cent) == [0, 1]


def test_ivf_assign_nearest_centroid(corpus):
    cent = similarity.ivf_centroids(corpus, nlist=2)
    # centroids 0 and 1 are identical vectors -> every assignment ties,
    # tie-break must pick the LOWEST list id
    assign = {r["vec_id"]: r["list_id"] for r in
              similarity.ivf_assign(corpus, cent).collect()}
    assert assign[0] == 0 and assign[2] == 0
    assert assign[3] == 0  # orthogonal ties at 0.0 for both -> lowest id
    assert len(assign) == 5


def test_ivf_topk_exact_when_nprobe_covers_all_lists(corpus):
    queries = corpus.filter("vec_id = 0")
    exact = similarity.brute_force_topk(corpus, queries, k=4).collect()
    ivf = similarity.ivf_topk(corpus, queries, k=4, nlist=2, nprobe=2).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cosine_sim"])
    assert sorted(map(key, ivf)) == sorted(map(key, exact))


def test_group_centroids_exact_and_partition_invariant(spark):
    from netflix_data_ingestion_spark.functions.vectors import group_centroids

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (1, [3.0, 4.0]),
            (2, [10.0, -10.0]),
        ],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in group_centroids(df, "label", "embedding").collect()}
    assert out[1]["n_vecs"] == 2
    assert out[1]["centroid"] == [2.0, 3.0]
    assert out[2]["centroid"] == [10.0, -10.0]

    # bit-identical under a different partitioning (the operator's point)
    out7 = {
        r["label"]: r
        for r in group_centroids(
            df.repartition(7), "label", "embedding"
        ).collect()
    }
    for k in out:
        assert out7[k]["centroid"] == out[k]["centroid"]


def test_ivf_trained_centroids_compose(spark):
    from netflix_data_ingestion_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids_trained,
    )
    from netflix_data_ingestion_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cent = ivf_centroids_trained(emb, nlist=4, iters=1)
    rows = cent.collect()
    assert 1 <= len(rows) <= 4
    assert all(len(r["centroid"]) == 64 for r in rows)
    assign = ivf_assign(emb, cent)
    # every vector lands in exactly one trained list
    assert assign.count() == emb.count()
    lists = {r["list_id"] for r in assign.collect()}
    assert lists <= {r["list_id"] for r in rows}


def test_l2_normalize_unit_length_and_zero_vector_policy(spark):
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.functions import vectors

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [0.0, -2.0])],
        ["id", "v"],
    )
    out = {
        r["id"]: r["u"]
        for r in df.select(
            "id", vectors.l2_normalize(F.col("v")).alias("u")
        ).collect()
    }
    assert out[1] == [0.6, 0.8]
    assert out[3] == [0.0, -1.0]
    # zero vector -> NULL components (caller's gate), not an error
    assert out[2] == [None, None]
    # after normalization, dot IS cosine
    a, b = out[1], out[3]
    assert abs(sum(x * y for x, y in zip(a, b)) - (-0.8)) < 1e-12


def test_pq_encode_shape_and_partition_invariance(spark):
    import random

    from netflix_data_ingestion_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = pq_train_codebooks(df, dim=8, m=4, ksub=4, iters=1)
    # codebook keys live in [0, m) x [0, ksub)
    assert all(0 <= s < 4 and 0 <= c < 4 for s, c in cents)
    codes = pq_encode(df, cents, dim=8, m=4).collect()
    # every vector gets exactly m codes, one per subspace
    per_vec = {}
    for r in codes:
        per_vec.setdefault(r["vec_id"], set()).add(r["sub"])
        assert (r["sub"], r["code"]) in cents
    assert all(subs == {0, 1, 2, 3} for subs in per_vec.values())
    # partition invariance: training + encoding are fixed-point integer
    # ops, so any repartitioning gives identical codes
    re = df.repartition(13)
    cents2 = pq_train_codebooks(re, dim=8, m=4, ksub=4, iters=1)
    assert cents2 == cents
    codes2 = pq_encode(re, cents2, dim=8, m=4).collect()
    assert sorted(map(tuple, codes2)) == sorted(map(tuple, codes))


def test_pq_topk_finds_cluster_neighbors(spark):
    import random

    from netflix_data_ingestion_spark.operators.similarity import pq_topk

    # two tight, well-separated direction clusters: PQ candidates must
    # recover same-cluster neighbors for every query
    rng = random.Random(3)

    def around(base, n, start_id):
        out = []
        for j in range(n):
            out.append(
                (start_id + j,
                 [b + rng.uniform(-0.02, 0.02) for b in base])
            )
        return out

    a = around([1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0], 12, 0)
    b = around([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0], 12, 100)
    df = spark.createDataFrame(a + b, "vec_id long, embedding array<float>")
    from pyspark.sql import functions as F

    queries = df.filter(F.col("vec_id").isin(0, 100))
    out = pq_topk(
        df, queries, dim=8, k=5, m=4, ksub=4, iters=1, candidates=12
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(n < 100 for n in got[0]) and len(got[0]) == 5
    assert all(n >= 100 for n in got[100]) and len(got[100]) == 5


def test_random_projection_signs_match_lsh_buckets(spark):
    import random

    from netflix_data_ingestion_spark.operators.similarity import (
        lsh_bucket,
        random_projection,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)
    ] + [(99, [0.1] * 5)]  # mis-sized: dropped by both
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = {
        r["vec_id"]: r["proj"]
        for r in random_projection(df, out_dim=8, dim=16).collect()
    }
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucket(df, planes=8, dim=16).collect()
    }
    assert 99 not in proj and 99 not in buckets
    assert set(proj) == set(buckets) and len(proj) == 30
    for vid, comps in proj.items():
        signs = "".join("1" if c > 0 else "0" for c in comps)
        assert signs == buckets[vid]


def test_multiprobe_recall_dominates_single_probe(spark):
    import random

    from netflix_data_ingestion_spark.operators.similarity import (
        lsh_multiprobe_topk,
        lsh_topk,
    )

    rng = random.Random(21)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from pyspark.sql import functions as F

    queries = df.filter(F.col("vec_id") < 6)
    single = {}
    for r in lsh_topk(df, queries, k=5, planes=8, dim=16).collect():
        single.setdefault(r["query_id"], []).append(r["cosine_sim"])
    multi = {}
    for r in lsh_multiprobe_topk(
        df, queries, k=5, planes=8, dim=16
    ).collect():
        multi.setdefault(r["query_id"], []).append(r["cosine_sim"])
    # the probed candidate set is a strict superset, so per query the
    # multiprobe result has at least as many hits and its best cosine
    # is at least as good
    for qid, sims in single.items():
        assert len(multi.get(qid, [])) >= len(sims)
        assert max(multi[qid]) >= max(sims)
    # and multiprobe answers at least as many queries
    assert set(single) <= set(multi)

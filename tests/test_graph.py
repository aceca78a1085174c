"""Connected components + dedup clustering (operators/graph.py)."""

from netflix_data_ingestion_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_cc_chain_and_islands(spark):
    # path 1-2-3-4 (min label floods the chain), island 10-11, lone pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "id_a long, id_b long",
    )
    out = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_long_path_converges(spark):
    # diameter 31 — plain neighbor-min would need 31 rounds; pointer
    # jumping must finish well inside the 25-round bound
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 31)], "id_a long, id_b long"
    )
    out = connected_components(pairs)
    assert {r["component"] for r in out.collect()} == {0}
    assert out.count() == 32


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_dedup_clusters_singletons_and_keep(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again now"),
            (3, "a completely different document about spark internals"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup_clusters(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert rows[1]["cluster_id"] == 1 and rows[2]["cluster_id"] == 1
    assert rows[1]["keep"] and not rows[2]["keep"]
    assert rows[1]["cluster_size"] == 2
    # doc 3 is a singleton cluster of itself
    assert rows[3]["cluster_id"] == 3 and rows[3]["keep"]
    assert rows[3]["cluster_size"] == 1


def _union_find_components(pairs):
    """Driver-side oracle: classic union-find, min-id relabel."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_cc_property_random_graphs(spark):
    """Distributed CC must agree with union-find on arbitrary graphs —
    chains, stars, cycles, self-loops, disjoint islands."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge = st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.lists(edge, min_size=1, max_size=60))
    def check(edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == _union_find_components(edges)

    check()


def test_triangle_counts_known_graph_and_hub_orientation(spark):
    from netflix_data_ingestion_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    # and a disconnected triangle {10,11,12}
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (10, 11), (11, 12), (10, 12)]
    # duplicate + reversed edges must not double-count
    edges += [(2, 1), (10, 11)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}
    # pendant node 5 is in no triangle -> absent
    assert 5 not in got


def test_kcore_peels_to_fixpoint(spark):
    from netflix_data_ingestion_spark.operators.graph import kcore

    # K4 {1..4} plus a chain 4-5-6 and a pendant triangle {6,7,8}:
    # the 3-core is exactly K4 (chain and triangle peel away — triangle
    # nodes have degree 2)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (5, 6), (6, 7), (6, 8), (7, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # fixpoint: an extra round changes nothing (the peel converged)
    again = {r["node"]: r["degree"] for r in kcore(df, k=3, rounds=4).collect()}
    assert again == got
    # k=2: every node has degree >= 2 (the chain's middle node included),
    # so the whole graph is its own 2-core
    got2 = {r["node"]: r["degree"] for r in kcore(df, k=2, rounds=4).collect()}
    assert set(got2) == {1, 2, 3, 4, 5, 6, 7, 8}
    # but clip one chain edge and the dangling tail peels recursively
    clipped = df.where("NOT (id_a = 5 AND id_b = 6)")
    got3 = {r["node"] for r in kcore(clipped, k=2, rounds=4).collect()}
    assert got3 == {1, 2, 3, 4, 6, 7, 8}


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA assigns each clique
    its own community (min member id) — the split CC cannot make."""
    from netflix_data_ingestion_spark.operators.graph import (
        label_propagation,
    )

    clique_a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = spark.createDataFrame(
        clique_a + clique_b + [(4, 10)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(pairs, rounds=4).collect()
    }
    assert all(out[n] == 1 for n in range(1, 5))
    assert all(out[n] == 10 for n in range(10, 14))


def test_lpa_partition_invariant_and_converged(spark):
    """Synchronous updates + total-order tie-breaks: identical result on
    a reshuffled input, and one extra round changes nothing once the
    two-clique graph has converged."""
    from netflix_data_ingestion_spark.operators.graph import (
        label_propagation,
    )

    clique_a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = spark.createDataFrame(
        clique_a + clique_b + [(4, 10)], "id_a long, id_b long"
    )
    base = sorted(
        (r["node"], r["community"])
        for r in label_propagation(pairs, rounds=4).collect()
    )
    shuffled = sorted(
        (r["node"], r["community"])
        for r in label_propagation(pairs.repartition(7), rounds=4).collect()
    )
    extra = sorted(
        (r["node"], r["community"])
        for r in label_propagation(pairs, rounds=5).collect()
    )
    assert base == shuffled == extra


def test_bfs_hops_exact_distances_and_bound(spark):
    """Path 1-2-3-4-5-6 from source 1: hops exact; node 6 (5 hops)
    absent at rounds=4; converged graph unchanged by an extra round."""
    from netflix_data_ingestion_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "id_a long, id_b long",
    )
    src = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["hops"]
        for r in bfs_hops(pairs, sources=src, rounds=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    # disconnected island never appears; extra round reaches node 6
    out5 = {
        r["node"]: r["hops"]
        for r in bfs_hops(pairs, sources=src, rounds=5).collect()
    }
    assert out5[6] == 5 and 10 not in out5 and 11 not in out5


def test_bfs_multi_source_takes_min(spark):
    from netflix_data_ingestion_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    src = spark.createDataFrame([(1,), (4,)], "node long")
    out = {
        r["node"]: r["hops"]
        for r in bfs_hops(pairs, sources=src, rounds=3).collect()
    }
    assert out == {1: 0, 4: 0, 2: 1, 3: 1}


def test_bfs_hops_requires_sources(spark):
    import pytest

    from netflix_data_ingestion_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="sources"):
        bfs_hops(pairs)

from __future__ import annotations

from netflix_data_ingestion_spark.operators.graph import pagerank


def _py_pagerank(edges, iters=2, damping=0.85, scale=1_000_000):
    """Reference replica of the fixed-point rounds (floor-half-up via
    round() on positive values matches Spark/DuckDB HALF_UP here)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = int(round((1 - damping) * scale))
    pr = {n: scale for n in nodes}
    for _ in range(iters):
        cin = {n: 0 for n in nodes}
        for s, d in edges:
            cin[d] += int(round(pr[s] / outdeg[s]))
        pr = {
            n: base + int(round(damping * cin[n]))
            for n in nodes
        }
    return pr


def test_matches_python_replica_on_cycle_graph(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    assert got == _py_pagerank(edges, iters=3)
    # c receives from two sources -> highest rank
    assert got["c"] == max(got.values())


def test_duplicate_edges_collapse(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], ["src", "dst"]
    )
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=1).collect()}
    # after dedup a has outdeg 2: b and c each get pr/2, equal ranks
    assert got["b"] == got["c"]


def test_dangling_nodes_keep_base_rank(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=2).collect()}
    # a has no in-edges: rank is the (1-d) base after any round
    assert got["a"] == 150_000
    assert got["b"] > got["a"]


def test_partition_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = sorted(
        (r["node"], r["pr"])
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]).repartition(1),
            iters=2,
        ).collect()
    )
    b = sorted(
        (r["node"], r["pr"])
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]).repartition(16),
            iters=2,
        ).collect()
    )
    assert a == b

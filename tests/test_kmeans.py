"""Fixed-point distributed k-means (operators/kmeans.py)."""

from netflix_data_ingestion_spark.operators.kmeans import kmeans_train


def _df(spark):
    # two obvious blobs around (0,0) and (10,10); ids interleave the blobs
    # so the lowest-id seeds (ids 0,1) start one in each blob
    rows = [
        (0, [0.1, 0.0]),
        (1, [10.0, 10.1]),
        (2, [0.0, 0.2]),
        (3, [9.9, 10.0]),
        (4, [0.2, 0.1]),
        (5, [10.1, 9.9]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs(spark):
    out = {
        r["vec_id"]: r
        for r in kmeans_train(
            _df(spark), k=2, iters=2
        ).collect()
    }
    blob_a = {out[i]["cluster_id"] for i in (0, 2, 4)}
    blob_b = {out[i]["cluster_id"] for i in (1, 3, 5)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert all(r["qdist"] >= 0 for r in out.values())


def test_kmeans_partition_invariant(spark):
    # identical assignment AND identical integer distances under a
    # different partitioning — the fixed-point reproducibility contract
    df = _df(spark)
    a = sorted(kmeans_train(df, k=2, iters=2).collect())
    b = sorted(kmeans_train(df.repartition(5), k=2, iters=2).collect())
    assert a == b


def test_kmeans_argmin_tie_breaks_to_lowest_cid(spark):
    """The vectorized (numpy) assignment must replay the struct-min tie
    rule exactly: equidistant centroids resolve to the LOWEST cluster
    id (np.argmin first-minimum over cid-sorted centroids)."""
    # seeds are the 2 lowest ids: centroids at 0.0 and 2.0; vector at
    # 1.0 is exactly equidistant -> must join cluster 0
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_train(df, k=2, iters=0).collect()
    }
    assert out[2] == out[0]

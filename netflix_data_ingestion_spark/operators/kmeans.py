"""Distributed k-means (Lloyd's algorithm) — beyond-reference
(BASELINE.json north star; trains the coarse quantizer that
operators/similarity.ivf_centroids stubs with sampled vectors).

The whole algorithm runs in FIXED-POINT integer space so every step is
bit-exact and order-free — the property that makes an ITERATIVE ML
algorithm verifiable against an external SQL engine, and re-runnable
on a cluster with identical shards:

- vectors quantize once: ``q = round(x * scale)`` per component (int64);
- distance is squared L2 on the grid: ``Σ (q_x - q_c)²`` — integer
  multiply-add, associative, no float summation anywhere;
- assignment is argmin over (distance, centroid_id) — total order,
  no rounding boundary to straddle;
- the centroid update is an integer mean: ``round(SUM(q) / n)`` per
  component (exact int64 sum, ONE double division, one round).

Iteration structure per round (driver-coordinated, like
operators/graph.connected_components):

1. assign: a NARROW map — centroids ride into the plan as int64 array
   literals (k·dim values, broadcast-by-literal), each row folds k
   integer distances and takes the struct-min.  No shuffle, no join.
2. update: posexplode -> groupBy (cluster, pos) — ONE keyed shuffle
   whose payload is k·dim partial sums, then a k·dim-row collect to
   refresh the literals (bounded by model size, not data size — the
   same contract as any parameter-server round trip).

At 100 TB: each round is one corpus pass + one k·dim-sized shuffle;
rounds are fixed (``iters``), so total cost is iters+1 passes.  The
float k-means in MLlib is faster per-op but neither reproducible
across partitionings nor oracle-checkable; this is the determinism-
first variant a data-curation pipeline actually wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def _qdist(qv: Column, qc) -> Column:
    """Integer squared L2 between a quantized vector column and a
    quantized centroid (literal list or array column) — a single JVM
    fold, exact int64."""
    qc = F.lit(qc) if isinstance(qc, list) else qc
    d = F.zip_with(
        qv, qc, lambda a, b: (a - b) * (a - b)
    )
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x)


def kmeans_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, cluster_id, qdist) — final Lloyd's assignment after ``iters``
    centroid updates, everything on the 1/``scale`` fixed-point grid.

    Seeds are the ``k`` lowest-id vectors (deterministic; k-means++ would
    add data-dependent randomness the reproducibility contract forbids —
    callers wanting better seeds pass a pre-shuffled id space).
    A cluster that loses all members simply drops out of later rounds
    (both the operator and the SQL oracle agree on this semantic).
    """
    q = ensure_parallelism(df).select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("long"),
        ).alias("__qv"),
    )
    seed_rows = q.orderBy(id_col).limit(k).collect()
    cents: dict[int, list[int]] = {
        cid: list(row["__qv"]) for cid, row in enumerate(seed_rows)
    }

    def assign(frame: DataFrame) -> DataFrame:
        # the centroid model rides as ONE literal array of (cid, cw)
        # structs with a transform-fold argmin over it, not one
        # distance tree per centroid: per-centroid trees cost seconds
        # of driver planning/codegen per fresh DataFrame and the plan
        # is rebuilt iters+1 times (the similarity.py PQ codebook
        # finding, measured 6x there; same fix here)
        entries = F.array(
            *[
                F.struct(
                    F.lit(cid).cast("int").alias("cid"),
                    F.lit(list(qc)).alias("cw"),
                )
                for cid, qc in sorted(cents.items())
            ]
        )
        best = F.array_min(
            F.transform(
                entries,
                lambda e: F.struct(
                    _qdist(F.col("__qv"), e["cw"]).alias("d"),
                    e["cid"].alias("cid"),
                ),
            )
        )
        return frame.select(
            id_col,
            "__qv",
            best["cid"].alias("cluster_id"),
            best["d"].alias("qdist"),
        )

    for _ in range(iters):
        assigned = assign(q)
        # update: k·dim partial sums -> driver (model-sized, not data-sized)
        new_rows = (
            assigned.select("cluster_id", F.posexplode("__qv"))
            .toDF("cluster_id", "pos", "q")
            .groupBy("cluster_id", "pos")
            .agg(F.sum("q").alias("sq"), F.count("*").alias("n"))
            .select(
                "cluster_id",
                "pos",
                F.round(F.col("sq").cast("double") / F.col("n"))
                .cast("long")
                .alias("qc"),
            )
            .collect()
        )
        cents = {}
        for r in new_rows:
            cents.setdefault(r["cluster_id"], [0] * len(seed_rows[0]["__qv"]))
            cents[r["cluster_id"]][r["pos"]] = r["qc"]

    return assign(q).select(id_col, "cluster_id", "qdist")

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
    # r13 (guide §1.2/§5 — fewer jobs, pin multi-traversal frames): the
    # Lloyd loop traverses q iters+2 times (seed collect, one update
    # job per round, final assignment); un-pinned, every traversal
    # re-plans and re-runs the scan + interpreted quantize transform.
    # One eager localCheckpoint makes each round a rescan of the
    # materialized quantized frame — the same within-query pin as the
    # graph loops, evaluated inside the timed region.
    q = q.localCheckpoint(eager=True)
    seed_rows = q.orderBy(id_col).limit(k).collect()
    cents: dict[int, list[int]] = {
        cid: list(row["__qv"]) for cid, row in enumerate(seed_rows)
    }

    id_t = q.schema[id_col].dataType.simpleString()

    # r13 assignment (guide §4.2 — hand whole batches to vectorized
    # native code): the former in-plan argmin rode the k·dim centroid
    # model as ONE literal struct array with an interpreted
    # transform-fold — measured per Lloyd round at sf0.1: ~0.6 s of
    # driver planning for the 1024-literal tree + interpreted per-row
    # folds, vs a 0.07 s plan and one numpy matmul-shaped pass here.
    # Bit-exactness is unconditional (unlike the float LSH fold): every
    # quantity is int64 and numpy integer arithmetic is exact — the
    # squared-L2 distances, the argmin (np.argmin's first-minimum tie
    # rule == struct-min's lowest-cid rule, with centroids ordered by
    # cid), and the per-(cluster, pos) partial sums all replay the SQL
    # semantics identically.  Vectors must share the centroid
    # dimensionality (they do by construction: centroids are seeds or
    # means of the same quantized column).
    def _assign_pandas(frame: DataFrame, cents_now: dict) -> DataFrame:
        import numpy as np
        import pandas as pd

        items = sorted(cents_now.items())
        C = np.array([cw for _, cw in items], dtype=np.int64)  # (k, dim)
        cids = np.array([cid for cid, _ in items], dtype=np.int32)

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["__qv"]]
                )  # (n, dim)
                D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(
                    axis=2
                )  # (n, k) int64, exact
                best = np.argmin(D, axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values,
                        "cluster_id": cids[best],
                        "qdist": D[np.arange(len(best)), best],
                    }
                )

        return frame.mapInPandas(
            fn, f"{id_col} {id_t}, cluster_id int, qdist long"
        )

    # update: map-side partial (cluster, pos) sums INSIDE the Python
    # stage (guide §2.3 — aggregate before you shuffle): each batch
    # ships k·dim partial rows instead of n·dim exploded rows; the
    # final mean keeps the exact SQL rounding (one double division,
    # Spark HALF_UP round) on the exact int64 sums.
    def _update_rows(cents_now: dict) -> list:
        import numpy as np
        import pandas as pd

        items = sorted(cents_now.items())
        C = np.array([cw for _, cw in items], dtype=np.int64)
        cids = np.array([cid for cid, _ in items], dtype=np.int64)

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["__qv"]]
                )
                D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                best = np.argmin(D, axis=1)
                out = {"cluster_id": [], "pos": [], "sq": [], "n": []}
                for bi in np.unique(best):
                    sel = V[best == bi]
                    dim = sel.shape[1]
                    out["cluster_id"].extend([int(cids[bi])] * dim)
                    out["pos"].extend(range(dim))
                    out["sq"].extend(sel.sum(axis=0).tolist())
                    out["n"].extend([sel.shape[0]] * dim)
                yield pd.DataFrame(out)

        partial = q.mapInPandas(
            fn, "cluster_id long, pos int, sq long, n long"
        )
        return (
            partial.groupBy("cluster_id", "pos")
            .agg(F.sum("sq").alias("sq"), F.sum("n").alias("n"))
            .select(
                "cluster_id",
                "pos",
                F.round(F.col("sq").cast("double") / F.col("n"))
                .cast("long")
                .alias("qc"),
            )
            .collect()
        )

    for _ in range(iters):
        new_rows = _update_rows(cents)
        cents = {}
        for r in new_rows:
            cents.setdefault(r["cluster_id"], [0] * len(seed_rows[0]["__qv"]))
            cents[r["cluster_id"]][r["pos"]] = r["qc"]

    return _assign_pandas(q, cents)

"""Similarity search over embedding columns — beyond-reference.

Brute-force cosine top-k is the correctness baseline: a cross join
between a (small) query set and the corpus, vector math via
``F.zip_with``/``F.aggregate`` (JVM-side, whole-stage codegen — no Python
transfer), ranked per query with a deterministic tie-break.  At 100 TB
the query side is broadcast and the corpus scan is embarrassingly
parallel — the cross join is a BroadcastNestedLoopJoin whose cost is
(corpus rows x query rows), linear in the corpus for a fixed query set.

The scale path is LSH bucketing (random hyperplane signs): each vector
gets a small bucket id; candidates are restricted to the query's bucket,
cutting the scanned fraction to ~1/2^planes per query at some recall
cost.  Hyperplane components derive from md5 hex digits, so the
bucketing is reproducible in any SQL engine (the DuckDB oracle runs the
identical construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.functions.vectors import cosine
from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Returns (query_id, neighbor_id, cosine_sim) with cosine rounded to 6
    decimals (also the ranking key, so cross-engine float noise cannot
    reorder the cut) and neighbor id as tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def _plane_components(plane: int, dim: int) -> list[float]:
    """Driver-side precompute of one hyperplane's components.

    Same construction as the runtime fold: value of the first hex digit
    of md5('<plane>:<dim>') minus 7.5 (pseudo-random in [-7.5, 7.5],
    reproducible in any engine that has md5).
    """
    import hashlib

    return [
        int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(1, dim + 1)
    ]


def _plane_projection(
    vec: F.Column, plane: int, dim: int | None = None
) -> F.Column:
    """One hyperplane projection Σ_d vec[d]·component(plane, d) as a single
    JVM fold over the array column — a zero-shuffle narrow map (replaces
    the former n×dims×planes posexplode + groupBy, which shuffled ~8,000
    rows per 1k-dim vector to compute 8 dot products).

    With `dim` given, the components are precomputed driver-side and
    embedded as an array literal (no md5 at runtime); otherwise they are
    derived per-element from md5, still inside one projection.  (An
    unrolled F.get-chain variant of the dim-given path — vectors.dot
    style — was measured and REJECTED: at 48 planes x 64 dims the
    generated code explodes past JIT limits and runs ~29x slower than
    this fold at sf0.1, 16.3s vs 0.56s warm.)  Products
    of float32 inputs and half-integer components are exact in double;
    the partial SUMS can still round (doubles with differing exponents),
    so the sign is stable except for projections within rounding error
    of zero — rare enough that cross-engine bucket parity holds in
    practice, but not an absolute invariant.
    """
    if dim is not None:
        comp = F.lit(_plane_components(plane, dim))
        terms = F.zip_with(vec, comp, lambda x, c: x.cast("double") * c)
    else:
        plane_s = F.lit(str(plane))
        terms = F.zip_with(
            vec,
            F.sequence(F.lit(1), F.size(vec)),
            lambda x, d: x.cast("double")
            * (
                F.conv(
                    F.substring(
                        F.md5(F.concat(plane_s, F.lit(":"), d.cast("string"))),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("double")
                - 7.5
            ),
        )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def bucket_expr(
    vec: F.Column,
    planes: int = 8,
    dim: int | None = None,
    plane_offset: int = 0,
) -> F.Column:
    """Sign pattern of `planes` random-hyperplane projections as a bit
    string — one narrow expression, usable in any projection.

    `plane_offset` shifts the hyperplane ids (planes offset+1..offset+n),
    giving independent hash tables for OR-amplified multi-table LSH
    (dedup.cosine_lsh_candidate_pairs).

    NULL-gated: a NULL, empty, or (with `dim` given) mis-sized vector
    yields a NULL bucket instead of silently collapsing into the all-'0'
    bucket (zip_with null-pads length mismatches, making every projection
    NULL and every bit '0' — which would cross-join all bad rows).
    Callers drop NULL buckets; the SQL oracle's unnest emits no rows for
    NULL/empty arrays, so the engines agree.
    """
    raw = F.concat(
        *[
            F.when(_plane_projection(vec, p, dim) > 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for p in range(plane_offset + 1, plane_offset + planes + 1)
        ]
    )
    guard = (
        F.size(vec) == F.lit(dim) if dim is not None else F.size(vec) > 0
    )
    return F.when(guard, raw)


def lsh_bucket(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket) — sign pattern of `planes` random-hyperplane projections.

    Pure projection: no explode, no shuffle, no join — the plan is a
    single narrow map over the scan, so at 100 TB this is one pass.
    Rows with NULL/empty/mis-sized vectors are dropped (see bucket_expr)."""
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            bucket_expr(F.col(vec_col), planes, dim).alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
    )


def bucket_table_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    tables: int,
    dim: int,
) -> DataFrame:
    """(id, tbl, bucket) — ALL ``tables`` multi-table LSH buckets per
    vector, computed in ONE vectorized Arrow batch pass (guide §4.2).

    The per-row JVM form (``tables × planes`` interpreted
    zip_with+aggregate folds) measured 2.6 ms/row at 48 planes × 64 dims
    — it dominated the whole candidate stage of
    dedup.cosine_lsh_candidate_pairs.  Here the fold runs once per
    BATCH: one (planes·tables × n) accumulator updated dim-sequentially.

    Bucket parity with ``bucket_expr`` is bit-exact, not approximate:
    the accumulation ``acc += V[:, d] * comp[:, d]`` performs, per
    (plane, row) cell, the identical left-associative sequence of IEEE
    double operations as the JVM ``aggregate(zip_with(...), 0.0,
    acc+x)`` fold (float32 inputs upcast exactly; components are
    half-integers), so every projection — and therefore every sign and
    bucket — is identical.  Rows whose vector is NULL or not exactly
    ``dim`` long emit nothing, mirroring bucket_expr's NULL gate plus
    the callers' NULL-bucket filter.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    comps = np.array(
        [
            _plane_components(p, dim)
            for p in range(1, tables * planes + 1)
        ]
    )  # (tables*planes, dim), half-integer doubles

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pin in batches:
            if len(pin) == 0:
                continue
            ok = pin[vec_col].map(
                lambda v: v is not None and len(v) == dim
            )
            sub = pin[ok]
            if len(sub) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in sub[vec_col]]
            )  # (n, dim)
            proj = np.zeros((comps.shape[0], len(sub)))
            for d in range(dim):  # dim-sequential: the JVM fold's order
                proj += np.multiply.outer(comps[:, d], V[:, d])
            bits = np.where(proj > 0, "1", "0")  # (P, n)
            out = []
            for t in range(tables):
                bucket = bits[t * planes]
                for p in range(t * planes + 1, (t + 1) * planes):
                    bucket = np.char.add(bucket, bits[p])
                out.append(
                    pd.DataFrame(
                        {
                            id_col: sub[id_col].values,
                            "tbl": np.full(len(sub), t, dtype=np.int32),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        bucketize, f"{id_col} {id_t}, tbl int, bucket string"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket.  May return < k rows per query (recall/cost trade-off).

    The bucket is a narrow expression computed inline on each side (the
    former union+distinct+join-back of a bucket table is gone), so the
    only shuffle left is the bucket-equi join itself — and the query side
    is tiny, so Catalyst broadcasts it."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        bucket_expr(F.col(vec_col), planes, dim).alias("q_bucket"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket_expr(F.col(vec_col), planes, dim).alias("c_bucket"),
    )
    scored = (
        q.join(c, F.col("q_bucket") == F.col("c_bucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
) -> DataFrame:
    """(list_id, centroid) — deterministic coarse quantizer: the `nlist`
    lowest-id corpus vectors.  A production IVF trains centroids offline
    (k-means over a sample); sampled centroids keep this reproducible in
    any engine, and the probe/assignment machinery is identical."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(F.col(id_col).alias("list_id"), F.col(vec_col).alias("centroid"))
    )


def train_subset(
    df: DataFrame, id_col: str, train_sample: float
) -> DataFrame:
    """Deterministic ~``train_sample`` fraction of rows for quantizer
    training: keep ids whose md5 first hex digit is below
    ``round(train_sample * 16)`` (granularity 1/16; >= 1.0 keeps all).
    Portable (the SQL oracle applies the identical predicate) and
    unbiased — md5's leading digit is uniform and independent of any
    data property."""
    hexmax = int(round(train_sample * 16))
    if hexmax >= 16:
        return df
    return df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
        < F.lit(format(max(1, hexmax), "x"))
    )


def ivf_centroids_trained(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 2,
    train_sample: float = 1.0,
) -> DataFrame:
    """(list_id, centroid) — TRAINED coarse quantizer: fixed-point Lloyd's
    k-means (operators/kmeans.kmeans_train) for the partition, then the
    deterministic per-cluster mean (functions/vectors.group_centroids)
    as the centroid vector.  Same output contract as `ivf_centroids`, so
    `ivf_assign`/`ivf_topk` compose unchanged; trained lists are
    balanced around the data's actual modes instead of whatever the
    lowest-id vectors happened to be, which evens out list sizes (the
    probe cost at 100 TB is the size of the largest probed list).

    ``train_sample`` < 1 trains on a deterministic md5-picked subset
    (`train_subset`) — the standard IVF practice: centroid quality
    needs only enough points per mode, so training cost shrinks ~1/f
    while the full corpus is still assigned to the trained lists."""
    from netflix_data_ingestion_spark.functions.vectors import (
        group_centroids,
    )
    from netflix_data_ingestion_spark.operators.kmeans import kmeans_train

    tr = train_subset(corpus, id_col, train_sample)
    assigned = kmeans_train(tr, id_col, vec_col, k=nlist, iters=iters)
    joined = tr.join(assigned.select(id_col, "cluster_id"), id_col)
    return group_centroids(joined, "cluster_id", vec_col).select(
        F.col("cluster_id").alias("list_id"),
        F.col("centroid").cast("array<float>").alias("centroid"),
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id) — each vector to its max-cosine centroid (argmax as a
    single min_by aggregation; ties break to the lowest list id).

    The centroid table is broadcast, so assignment is a narrow pass over
    the corpus — no shuffle until the tiny per-id argmax.  At 100 TB the
    assignment is written once as a table partitioned by list_id, making
    every probe a partition-pruned scan of ~nprobe/nlist of the corpus.
    """
    scored = (
        ensure_parallelism(corpus)
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "sim",
            F.round(cosine(F.col(vec_col), F.col("centroid")), 6),
        )
    )
    return scored.groupBy(id_col).agg(
        F.min_by(
            "list_id", F.struct((-F.col("sim")).alias("ns"), F.col("list_id"))
        ).alias("list_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    trained: bool = True,
    iters: int = 2,
    train_sample: float = 1.0,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its `nprobe` nearest
    inverted lists and ranks exactly within them.  May return < k rows
    per query — recall grows with nprobe/nlist (nprobe == nlist is exact
    brute force).

    `trained=True` (the default) trains the coarse quantizer with
    fixed-point Lloyd's k-means (`ivf_centroids_trained`), which balances
    list sizes around the data's modes; the probe cost at scale is the
    size of the largest probed list, so balance is the scaling knob.
    `trained=False` falls back to the sampled lowest-id quantizer
    (audit/debug: zero training cost, reproducible anywhere).
    ``train_sample`` < 1 trains on an md5-picked fraction (corpora large
    enough that every mode still lands >= nlist training points — don't
    use on toy inputs, where the sample can be empty).

    ``centroids`` supplies a PRE-TRAINED (list_id, centroid) table and
    skips training entirely — the production posture at 100 TB, where
    the coarse quantizer is a persisted model (trained once, e.g. via
    `ivf_centroids_trained` written to parquet), not an in-plan
    subroutine re-run per query batch."""
    if centroids is not None:
        # a persisted model table is tiny and re-scannable — no pin needed
        cent = centroids
    else:
        if trained:
            cent = ivf_centroids_trained(
                corpus, id_col, vec_col, nlist, iters, train_sample
            )
        else:
            cent = ivf_centroids(corpus, id_col, vec_col, nlist)
        # the centroid table is nlist rows but derives from a corpus-wide
        # join+agg; it is referenced twice below (assignment + query
        # probe), so pin it or the quantizer's final pass runs once per
        # reference
        cent = cent.localCheckpoint(eager=True)
    assign = ivf_assign(corpus, cent, id_col, vec_col)
    qp = queries.crossJoin(F.broadcast(cent)).withColumn(
        "sim", F.round(cosine(F.col(vec_col), F.col("centroid")), 6)
    )
    wq = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("list_id").asc()
    )
    probes = (
        qp.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(F.col(id_col).alias("query_id"), "list_id")
    )
    cand = probes.join(
        assign.select(F.col(id_col).alias("neighbor_id"), "list_id"),
        "list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
            ),
            "neighbor_id",
        )
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011): compressed-domain ANN
# ---------------------------------------------------------------------------


def _pq_qdist(sqv: F.Column, qc) -> F.Column:
    """Integer squared-L2 between a quantized subvector column and a
    codeword (literal list or array column) — one JVM fold
    (operators/kmeans._qdist shape)."""
    qc = F.lit(qc) if isinstance(qc, list) else qc
    d = F.zip_with(sqv, qc, lambda a, b: (a - b) * (a - b))
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _pq_codebook_entries(cents: dict) -> F.Column:
    """The whole codebook as ONE literal array of (sub, cid, cw)
    structs.  Keeping the codebook a single literal — instead of
    unrolling one distance-expression tree per codeword into a
    when-chain — matters twice over: the plan stays small (the 64-tree
    form cost ~3.5s of driver planning/codegen per fresh DataFrame at
    m=4 x ksub=8, measured), and an unrolled scalar form blows the JVM
    64KB codegen method limit outright (the bucket_expr rejection,
    re-confirmed here)."""
    return F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.lit(cid).cast("int").alias("cid"),
                F.lit(list(cw)).alias("cw"),
            )
            for (s, cid), cw in sorted(cents.items())
        ]
    )


def _pq_quantized(
    df: DataFrame, id_col: str, vec_col: str, dim: int, scale: int
) -> DataFrame:
    """(id, __qv) — int64 fixed-point vectors; mis-sized vectors drop
    (the NULL-gate discipline of bucket_expr).

    The size gate tests the RAW vector column, not __qv: transform()
    preserves length, and a filter on the derived alias gets substituted
    through the projection by predicate pushdown — re-running the whole
    interpreted quantize lambda once per row just to measure its length
    (and below the ensure_parallelism exchange, on the un-split scan)."""
    return (
        ensure_parallelism(df)
        .filter(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * scale).cast("long"),
            ).alias("__qv"),
        )
    )


def _pq_sub_rows(q: DataFrame, id_col: str, m: int, dsub: int) -> DataFrame:
    """(id, sub, sqv) — each vector split into its m subvectors (one
    narrow explode, x m rows of 1/m-size payload: net zero data growth).

    explode_outer, not explode: InferFiltersFromGenerate would bolt a
    size(...)>0 filter onto a plain explode whose child is this whole
    derived struct array, re-evaluating the quantize+slice pipeline a
    second time per row (the dsir_llr_weights trap, measured there at
    6x).  The array is never empty (m >= 1), so outer semantics are
    identical and the rule skips it."""
    return q.select(
        F.col(id_col),
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(F.col("__qv"), s * dsub + 1, dsub).alias(
                            "sqv"
                        ),
                    )
                    for s in range(m)
                ]
            )
        ).alias("__ss"),
    ).select(id_col, F.col("__ss.sub").alias("sub"), F.col("__ss.sqv").alias("sqv"))


def _pq_assign_expr(cents: dict, m: int) -> F.Column:
    """Best-codeword id for a (sub, sqv) row: argmin over the row's
    subspace slice of the literal codebook array — filter the (sub,
    cid, cw) entries to this row's sub, map each to a (d, cid) struct
    (struct ordering = distance then lowest cid, the kmeans tie rule),
    take array_min — ONE narrow expression, no join, no when-chain.
    See _pq_codebook_entries for why the codebook rides as a single
    literal (measured 6x: 0.27s vs 1.62s per encode at sf0.1)."""
    entries = _pq_codebook_entries(cents)
    mine = F.filter(entries, lambda e: e["sub"] == F.col("sub"))
    best = F.array_min(
        F.transform(
            mine,
            lambda e: F.struct(
                _pq_qdist(F.col("sqv"), e["cw"]).alias("d"),
                e["cid"].alias("cid"),
            ),
        )
    )
    return best["cid"]


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    scale: int = 1_000_000,
) -> dict:
    """{(sub, cid): [int64 codeword]} — per-subspace k-means codebooks on
    the 1/scale fixed-point grid (Lloyd's, operators/kmeans semantics:
    lowest-id seeds, integer distances, integer-mean updates, empty
    codewords drop out).  All m subspaces train TOGETHER: each round is
    one pass over the (id, sub, sqv) rows plus one (sub, cid, pos)-keyed
    shuffle whose payload is m x ksub x dsub partial sums — model-sized,
    the parameter-server round-trip license of kmeans_train.
    """
    dsub = dim // m
    # pin the quantized frame for the loop's multiple traversals (seed
    # collect + one update job per round) — the kmeans_train discipline
    q = _pq_quantized(corpus, id_col, vec_col, dim, scale).localCheckpoint(
        eager=True
    )
    seed_rows = q.orderBy(id_col).limit(ksub).collect()
    cents = {
        (s, cid): list(row["__qv"])[s * dsub : (s + 1) * dsub]
        for cid, row in enumerate(seed_rows)
        for s in range(m)
    }
    sub_rows = _pq_sub_rows(q, id_col, m, dsub)
    for _ in range(iters):
        # r13 (guide §4.2/§2.3 — the kmeans_train treatment): codeword
        # assignment + per-(sub, code, spos) partial sums run
        # vectorized in ONE Arrow pass; only m·ksub·dsub partial rows
        # leave Python per batch.  All-int64 numpy arithmetic replays
        # the SQL fold exactly (argmin first-minimum == struct-min
        # lowest-cid with per-sub cid-sorted codebooks); the final
        # mean keeps the exact SQL rounding on the exact sums.
        def _partials(batches):
            import numpy as np
            import pandas as pd

            by_sub = {}
            for s in range(m):
                items = sorted(
                    (cid, cw) for (sb, cid), cw in cents.items() if sb == s
                )
                by_sub[s] = (
                    np.array([cid for cid, _ in items], dtype=np.int64),
                    np.array([cw for _, cw in items], dtype=np.int64),
                )
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out = {"sub": [], "code": [], "spos": [], "sq": [], "n": []}
                subs = pdf["sub"].to_numpy()
                for s in np.unique(subs):
                    cids, C = by_sub[int(s)]
                    sel = pdf["sqv"][subs == s]
                    V = np.stack(
                        [np.asarray(v, dtype=np.int64) for v in sel]
                    )
                    D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    best = np.argmin(D, axis=1)
                    for bi in np.unique(best):
                        rows = V[best == bi]
                        out["sub"].extend([int(s)] * dsub)
                        out["code"].extend([int(cids[bi])] * dsub)
                        out["spos"].extend(range(dsub))
                        out["sq"].extend(rows.sum(axis=0).tolist())
                        out["n"].extend([rows.shape[0]] * dsub)
                yield pd.DataFrame(out)

        new_rows = (
            sub_rows.mapInPandas(
                _partials, "sub int, code int, spos int, sq long, n long"
            )
            .groupBy("sub", "code", "spos")
            .agg(F.sum("sq").alias("sq"), F.sum("n").alias("n"))
            .select(
                "sub",
                "code",
                "spos",
                F.round(F.col("sq").cast("double") / F.col("n"))
                .cast("long")
                .alias("qc"),
            )
            .collect()
        )
        cents = {}
        for r in new_rows:
            cents.setdefault((r["sub"], r["code"]), [0] * dsub)
            cents[(r["sub"], r["code"])][r["spos"]] = r["qc"]
    return cents


def pq_encode(
    corpus: DataFrame,
    cents: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, sub, code) — each vector compressed to m codebook ids (the
    stored PQ index: m small ints instead of dim floats, a ~dim/m x
    compression).  One narrow Arrow pass (r13, guide §4.2): the
    vectorized argmin replays the former in-plan literal-codebook fold
    exactly — all quantities int64, numpy integer arithmetic exact,
    np.argmin's first-minimum tie rule == struct-min's lowest-cid rule
    with per-sub cid-sorted codebooks."""
    import numpy as np
    import pandas as pd

    dsub = dim // m
    q = _pq_quantized(corpus, id_col, vec_col, dim, scale)
    sub_rows = _pq_sub_rows(q, id_col, m, dsub)
    id_t = sub_rows.schema[id_col].dataType.simpleString()
    by_sub = {}
    for s in range(m):
        items = sorted(
            (cid, cw) for (sb, cid), cw in cents.items() if sb == s
        )
        by_sub[s] = (
            np.array([cid for cid, _ in items], dtype=np.int32),
            np.array([cw for _, cw in items], dtype=np.int64),
        )

    def _codes(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            subs = pdf["sub"].to_numpy()
            code = np.zeros(len(pdf), dtype=np.int32)
            for s in np.unique(subs):
                cids, C = by_sub[int(s)]
                mask = subs == s
                V = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["sqv"][mask]]
                )
                D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                code[mask] = cids[np.argmin(D, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sub": pdf["sub"].values,
                    "code": code,
                }
            )

    return sub_rows.mapInPandas(_codes, f"{id_col} {id_t}, sub int, code int")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    candidates: int = 50,
    scale: int = 1_000_000,
    cents: dict | None = None,
) -> DataFrame:
    """Approximate top-k via product quantization with exact re-rank:
    train per-subspace codebooks -> encode the corpus to m-byte codes ->
    score candidates in the COMPRESSED domain by asymmetric distance
    (ADC: per query, a m x ksub lookup table of integer subvector
    distances; a vector's approx distance is the sum of its codes'
    table entries) -> exact cosine re-rank of the top ``candidates``.

    Scale shape: training is kmeans-style (iters corpus passes +
    model-sized shuffles); encoding is a narrow map; the ADC scan joins
    the (id, sub, code) table against a BROADCAST per-query lookup
    table and reduces with one combinable (query, neighbor) sum — the
    corpus-side payload is 3 small ints per subvector, never the float
    vectors, which is the PQ promise at 100 TB (the index fits in a
    fraction of the vector storage; full vectors are fetched only for
    the ``candidates``-bounded re-rank).  All distances are fixed-point
    integers, so ranking is bit-stable across engines; only the final
    re-ranked cosine is float (rounded to 6, the shared tie discipline).
    May return < k rows per query (recall grows with ``candidates``).

    ``cents`` supplies PRE-TRAINED codebooks ({(sub, cid): [int64]},
    the `pq_train_codebooks` output, e.g. persisted to parquet and read
    back) and skips training — the 100 TB posture, where codebooks are
    a persisted model trained once per corpus snapshot."""
    if cents is None:
        cents = pq_train_codebooks(
            corpus, id_col, vec_col, dim, m, ksub, iters, scale
        )
    codes = pq_encode(corpus, cents, id_col, vec_col, dim, m, scale).select(
        F.col(id_col).alias("neighbor_id"), "sub", "code"
    )
    dsub = dim // m
    qq = _pq_quantized(queries, id_col, vec_col, dim, scale)
    # explode_outer: the _pq_sub_rows inferred-filter rationale — the
    # per-query ADC table array is never empty
    adc = qq.select(
        F.col(id_col).alias("query_id"),
        F.explode_outer(
            F.transform(
                _pq_codebook_entries(cents),
                lambda e: F.struct(
                    e["sub"].alias("sub"),
                    e["cid"].alias("code"),
                    _pq_qdist(
                        F.slice(
                            F.col("__qv"), e["sub"] * dsub + 1, F.lit(dsub)
                        ),
                        e["cw"],
                    ).alias("pd"),
                ),
            )
        ).alias("__e"),
    ).select(
        "query_id",
        F.col("__e.sub").alias("sub"),
        F.col("__e.code").alias("code"),
        F.col("__e.pd").alias("pd"),
    )
    approx = (
        codes.join(F.broadcast(adc), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pd").alias("adist"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    cand = (
        approx.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= candidates)
        .select("query_id", "neighbor_id")
    )
    scored = (
        cand.join(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
            ),
            "neighbor_id",
        )
        .withColumn(
            "cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, proj) — Johnson-Lindenstrauss-style dimensionality reduction
    to ``out_dim`` via the md5 hyperplane family (Achlioptas-flavored
    discrete components): output component p is the plane-p projection
    Σ_d vec[d]·(hexdigit(md5('p:d')) − 7.5).  ``bucket_expr`` is the
    SIGN pattern of exactly this map, so indexes built in the reduced
    space stay consistent with the LSH buckets; distances contract
    toward 1±ε per JL with out_dim ~ O(log n / ε²).

    Pure narrow map (one JVM fold per output dim, no shuffle, no
    Python) — the cheap first stage before brute-force/PQ in the
    reduced space.  With ``dim`` given, components embed as literals
    (no runtime md5).  NULL/mis-sized vectors drop, the bucket_expr
    NULL-gate discipline.
    """
    vec = F.col(vec_col)
    arr = F.array(
        *[_plane_projection(vec, p, dim) for p in range(1, out_dim + 1)]
    )
    guard = (
        F.size(vec) == F.lit(dim) if dim is not None else F.size(vec) > 0
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col), F.when(guard, arr).alias("proj"))
        .filter(F.col("proj").isNotNull())
    )


def _flip_bit(bucket: F.Column, i: int, planes: int) -> F.Column:
    """The bucket bit-string with bit ``i`` (1-based) flipped."""
    flipped = F.when(
        F.substring(bucket, i, 1) == "1", F.lit("0")
    ).otherwise(F.lit("1"))
    return F.concat(
        F.substring(bucket, 1, i - 1),
        flipped,
        F.substring(bucket, i + 1, planes - i),
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB'07): each query probes its
    own bucket AND every Hamming-distance-1 neighbor bucket (planes+1
    probes), then ranks exactly within the union.  Near-miss vectors —
    the dominant LSH failure, one hyperplane's sign away — are
    recovered at a cost that scales ONLY with the query side (the
    corpus is still bucketed once, narrowly; no extra tables, no extra
    corpus passes — contrast OR-amplified multi-table LSH, which
    re-buckets the corpus per table).  Expected candidates ~
    (planes+1)/2^planes of the corpus per query.

    Single-bit flips are distinct buckets, so no candidate pair is
    generated twice — no dedup stage.  Same NULL-gate and tie
    discipline as `lsh_topk`; strictly better recall at the same k
    (the probed set is a superset)."""
    qb = bucket_expr(F.col(vec_col), planes, dim)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            qb.alias("__b0"),
        )
        .filter(F.col("__b0").isNotNull())
        .select(
            "query_id",
            "q_vec",
            F.explode(
                F.array(
                    F.col("__b0"),
                    *[
                        _flip_bit(F.col("__b0"), i, planes)
                        for i in range(1, planes + 1)
                    ],
                )
            ).alias("q_bucket"),
        )
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket_expr(F.col(vec_col), planes, dim).alias("c_bucket"),
    )
    scored = (
        q.join(c, F.col("q_bucket") == F.col("c_bucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim")
    )

"""Vector math over ``array<float>`` embedding columns — pure built-ins.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
row transfer), which is the scale path for brute-force similarity over
100 TB of embeddings.  Elements are cast to double before accumulation so
results are stable regardless of the storage element type (float32 in the
testdata parquet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Array length of the first row's vector (embedding tables are
    fixed-dim; parquet list schemas don't carry the length)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return None if row is None else int(row["d"])


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two numeric arrays (double).

    With `dim` given, the sum is UNROLLED into a left-associative chain of
    ``F.get`` terms — bit-identical to the sequential fold (IEEE
    ``0.0 + x == x``, same association order) but inside whole-stage
    codegen, where the higher-order-function fold is interpreted per row
    (~10x slower in all-pairs scoring).
    """
    if dim is not None:
        out = F.get(a, 0).cast("double") * F.get(b, 0).cast("double")
        for i in range(1, dim):
            out = out + F.get(a, i).cast("double") * F.get(b, i).cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    """L2 norm of a numeric array (double); see `dot` for the `dim` fast path."""
    if dim is not None:
        sq = F.get(a, 0).cast("double") * F.get(a, 0).cast("double")
        for i in range(1, dim):
            sq = sq + F.get(a, i).cast("double") * F.get(a, i).cast("double")
        return F.sqrt(sq)
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; NULL-safe only as far as Spark array ops are."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """(group, n_vecs, centroid) — element-wise mean vector per group.

    Floating-point aggregation order is nondeterministic across Spark
    partitions (and across engines), so a naive ``SUM(double)`` centroid
    is not reproducible run-to-run — a real problem when a training
    pipeline must re-derive identical shards after a retry.  This
    operator therefore computes the mean over components QUANTIZED to a
    1/``scale`` fixed-point grid: ``q = round(x * scale)`` (HALF_UP,
    identical in Spark and DuckDB), summed as exact int64 (associative
    and commutative — order-free), with ONE double division at the end.
    Quantization error is bounded by 0.5/scale per component (5e-7 at
    the default), far below float32 input precision; in exchange the
    result is bit-identical on any partitioning, any engine.

    Plan shape: posexplode (narrow flatMap) -> groupBy (group, pos) with
    map-side combine — the shuffle carries one int64 partial sum per
    (group, dim), i.e. ~|groups|·dims rows regardless of corpus size —
    then a |groups|-row reassembly.  Overflow headroom: int64 caps the
    group size at ~9e12 / scale / max|x| vectors (≈4.6e6 billion-row
    groups at |x|<=2), far beyond any real corpus.
    """
    per_dim = (
        df.select(F.col(group_col), F.posexplode(F.col(vec_col)))
        .toDF(group_col, "pos", "x")
        .groupBy(group_col, "pos")
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * scale).cast("long")
            ).alias("sq"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "c", F.col("sq").cast("double") / (F.col("n") * float(scale))
        )
    )
    return per_dim.groupBy(group_col).agg(
        F.max("n").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("centroid"),
    )


def l2_normalize(a: Column, dim: int | None = None) -> Column:
    """Unit-length rescale of a numeric array (double components).

    The featurization step every cosine-based pipeline wants up front:
    after normalization, cosine similarity degrades to a plain dot
    product (one fold instead of three), which is how an ANN index
    avoids per-pair norm recomputation at serving time.

    Each component is ONE double division by the (fold-ordered) L2 norm
    — cross-engine IEEE-identical given the same association order (the
    oracle folds the same way).  Zero vectors map to NULL components
    (``try_divide`` — ANSI mode would otherwise raise on 0/0, and
    DuckDB's division by zero is NULL too) rather than raising — the
    caller's gate, same policy as the LSH bucket NULL-gating.
    """
    n = norm(a, dim)
    return F.transform(a, lambda x: F.try_divide(x.cast("double"), n))


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """(scale, codes) — symmetric per-vector int8 scalar quantization:
    scale = max(|x_d|), code_d = round(x_d * 127 / scale) in [-127,
    127].  The 4x storage cut (vs float32) that serving stacks and
    memory-mapped ANN indexes use; dequantize as code * scale / 127.

    Engine-portable: scale is a SELECTED value (max of exact
    float->double casts — no arithmetic to diverge), each code is one
    multiply + one divide + one round, the same IEEE op sequence
    everywhere (the operators/kmeans fixed-point discipline).
    Zero/empty vectors yield NULL codes (nothing to scale) rather than
    a divide-by-zero.
    """
    s = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    codes = F.when(
        s > 0,
        F.transform(
            vec,
            lambda x: F.round(x.cast("double") * 127.0 / s).cast("int"),
        ),
    )
    return s, codes

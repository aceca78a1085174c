"""Distributed PCA (top principal component) by power iteration.

The scale split every distributed eigen-solver uses: the DATA pass
computes exact second moments — per-(i, j) sums of fixed-point
quantized component products, one combinable groupBy whose output is
dim^2 rows no matter the corpus size — and the ITERATION runs on the
driver over the dim x dim covariance (the parameter-server license:
model-sized state only, like kmeans centroids / PQ codebooks).

Determinism contract (oracle-provable): moments are exact int64 sums of
``round(x * scale)`` products (order-free, partition-invariant);
covariance entries, every matvec, every normalization, and the final
Rayleigh quotient are IEEE-double expressions evaluated in EXPLICIT
left-to-right index order — the same order DuckDB's
``list_sum(list_transform(...))`` evaluates — so an 8-iteration power
iterate is bit-identical across engines and the contract can hash it
after one final round(6).

Overflow headroom: |q| <= scale * max|x|; per-row pair products stay in
int64 (<= (scale * max|x|)^2 ~ 4e12 at scale=1e6, |x|<=2) and the
cross-row moment SUMS accumulate as DECIMAL(38,0) — the exact-moment
convention (DuckDB twin: ``::HUGEINT``) — so the corpus cap is ~1e38 /
(scale * max|x|)^2 rows (~2.5e25 at scale=1e6): effectively unbounded
at 100 TB.  ANSI mode raises rather than wraps past 38 digits.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def _matvec(cov: list[list[float]], v: list[float], dim: int) -> list[float]:
    """C @ v with EXPLICIT sequential accumulation (j ascending) — the
    op order DuckDB's list_sum(list_transform(...)) evaluates."""
    w = []
    for i in range(dim):
        acc = 0.0
        for j in range(dim):
            acc = acc + cov[i][j] * v[j]
        w.append(acc)
    return w


def _normalize(w: list[float]) -> list[float]:
    s = 0.0
    for x in w:
        s = s + x * x
    norm = math.sqrt(s)
    return [x / norm for x in w]


def _power_iterate(
    cov: list[list[float]], dim: int, iters: int
) -> tuple[list[float], float]:
    """Driver-side deterministic power iteration, spec mirrored 1:1 by
    the SQL oracle: v0 = ones; K times (w = C v; v = w/||w||); then
    eig = v . (C v) — the Rayleigh quotient of the unit-norm iterate."""
    v = [1.0] * dim
    for _ in range(iters):
        v = _normalize(_matvec(cov, v, dim))
    u = _matvec(cov, v, dim)
    eig = 0.0
    for i in range(dim):
        eig = eig + v[i] * u[i]
    return v, eig


def _collect_moments(
    df: DataFrame, vec_col: str, dim: int, scale: int
):
    """The single data pass shared by every PCA entry point: exact
    DECIMAL(38,0) first/second moments of the quantized vectors.
    Returns (s2 dict, s1 dict, n) or None when no vector survives the
    fixed-dim filter."""
    q = (
        ensure_parallelism(df)
        .where(F.col(vec_col).isNotNull())
        # Ragged or null-component vectors would make element_at yield
        # NULLs and silently skew per-(i,j) counts — exclude them up
        # front so every surviving row contributes to every moment.
        .where(F.size(vec_col) == dim)
        .where(~F.exists(vec_col, lambda x: x.isNull()))
        .select(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * scale).cast("long"),
            ).alias("qv")
        )
    )
    pair_expr = f"""flatten(transform(sequence(1, {dim}), i ->
        transform(sequence(1, {dim}), j ->
          struct(i as i, j as j,
                 element_at(qv, i) * element_at(qv, j) as p))))"""
    s2 = {
        (r["i"], r["j"]): int(r["s"])
        for r in q.select(F.explode(F.expr(pair_expr)).alias("x"))
        .groupBy(F.col("x.i").alias("i"), F.col("x.j").alias("j"))
        .agg(F.sum(F.col("x.p").cast("decimal(38,0)")).alias("s"))
        .collect()
    }
    s1n = (
        q.select(F.posexplode("qv").alias("pos", "qx"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("qx").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    if not s1n:
        return None
    s1 = {r["pos"] + 1: int(r["s"]) for r in s1n}
    counts = {r["n"] for r in s1n}
    if len(counts) != 1 or len(s1) != dim or len(s2) != dim * dim:
        raise ValueError(
            "pca moments: inconsistent moment frame "
            f"(per-pos counts {sorted(counts)}, |s1|={len(s1)}, "
            f"|s2|={len(s2)}, dim={dim}) — input vectors violate the "
            "fixed-dim contract despite the size filter"
        )
    return s2, s1, counts.pop()


def _covariance(s2, s1, n: int, dim: int, scale: int):
    d2 = float(n * scale * scale)
    d1 = float(n * scale)
    return [
        [
            s2[(i, j)] / d2 - (s1[i] / d1) * (s1[j] / d1)
            for j in range(1, dim + 1)
        ]
        for i in range(1, dim + 1)
    ]


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """(pos, loading, eigval) — the `iters`-step power iterate of the
    exact covariance of the quantized vectors: 64 rows, loadings of the
    (unit-norm) top principal direction plus the Rayleigh-quotient
    eigenvalue estimate, both rounded to 6 decimals at the very end."""
    spark = df.sparkSession
    out_schema = "pos int, loading double, eigval double"
    moments = _collect_moments(df, vec_col, dim, scale)
    if moments is None:
        return spark.createDataFrame([], out_schema)
    s2, s1, n = moments
    cov = _covariance(s2, s1, n, dim, scale)
    v, eig = _power_iterate(cov, dim, iters)
    # round JVM-side (F.round = HALF_UP, matching DuckDB ROUND) — Python
    # round() is banker's and could diverge on an exact tie
    return (
        spark.createDataFrame(
            [(i + 1, v[i], eig) for i in range(dim)],
            out_schema,
        )
        .select(
            "pos",
            F.round("loading", 6).alias("loading"),
            F.round("eigval", 6).alias("eigval"),
        )
        .orderBy("pos")
    )


def project_principal_components(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 2,
    iters: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, pc1..pck) — every (valid, fixed-dim) vector projected onto
    the top-``k`` deflation components: the dimensionality-reduction /
    whitening-prep primitive (proj_c = sum_i (x_i - mean_i) * v_c[i]).

    The model side (means + k loading vectors) is computed exactly as
    in top_principal_components and embedded as LITERAL arrays, so the
    projection itself is a pure narrow JVM map over the corpus — no
    join, no shuffle, no Python; the single F.aggregate fold per
    component evaluates left-to-right, matching the SQL twin's
    list_sum(list_transform(...)) bit-for-bit before the final
    round(6)."""
    spark = df.sparkSession
    cols = ", ".join(f"pc{c} double" for c in range(1, k + 1))
    out_schema = f"{id_col} long, {cols}"
    moments = _collect_moments(df, vec_col, dim, scale)
    if moments is None:
        return spark.createDataFrame([], out_schema)
    s2, s1, n = moments
    cov = _covariance(s2, s1, n, dim, scale)
    d1 = float(n * scale)
    mean = [s1[i] / d1 for i in range(1, dim + 1)]
    comps = []
    for c in range(k):
        v, eig = _power_iterate(cov, dim, iters)
        comps.append(v)
        if c < k - 1:
            cov = [
                [cov[i][j] - eig * v[i] * v[j] for j in range(dim)]
                for i in range(dim)
            ]
    base = (
        df.where(F.col(vec_col).isNotNull())
        .where(F.size(vec_col) == dim)
        .where(~F.exists(vec_col, lambda x: x.isNull()))
    )
    mean_arr = F.array(*[F.lit(m) for m in mean])

    def _terms(v_arr):
        # closure, NOT a defaulted lambda parameter: PySpark reads a
        # second lambda param as the (element, index) form
        return F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.element_at(F.col(vec_col), i).cast("double")
                - F.element_at(mean_arr, i)
            )
            * F.element_at(v_arr, i),
        )

    projs = []
    for c, v in enumerate(comps, 1):
        v_arr = F.array(*[F.lit(x) for x in v])
        projs.append(
            F.round(
                F.aggregate(_terms(v_arr), F.lit(0.0), lambda a, x: a + x),
                6,
            ).alias(f"pc{c}")
        )
    return base.select(F.col(id_col).cast("long").alias(id_col), *projs)


def top_principal_components(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    iters: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """(component, pos, loading, eigval) — the top-``k`` principal
    directions by HOTELLING DEFLATION over the same single-pass exact
    covariance as top_principal_component: component 1 is the plain
    ``iters``-step power iterate; each next component power-iterates
    C' = C - eig_c * v_c v_c^T (rank-one deflation), which annihilates
    the found direction so the iteration converges to the next one.

    Scale shape is unchanged: ONE combinable data pass (dim^2 moment
    rows, corpus-size-free) and k * iters driver-side dim x dim matvecs
    (parameter-server license).  Every float op — deflation entries
    included (``cov[i][j] - eig * v[i] * v[j]``, left-to-right) — is
    sequenced exactly like the SQL twin, so the full k-component table
    is bit-identical across engines after the final round(6)."""
    spark = df.sparkSession
    out_schema = "component int, pos int, loading double, eigval double"
    moments = _collect_moments(df, vec_col, dim, scale)
    if moments is None:
        return spark.createDataFrame([], out_schema)
    s2, s1, n = moments
    cov = _covariance(s2, s1, n, dim, scale)
    rows = []
    for c in range(1, k + 1):
        v, eig = _power_iterate(cov, dim, iters)
        rows.extend((c, i + 1, v[i], eig) for i in range(dim))
        if c < k:
            cov = [
                [
                    cov[i][j] - eig * v[i] * v[j]
                    for j in range(dim)
                ]
                for i in range(dim)
            ]
    return (
        spark.createDataFrame(rows, out_schema)
        .select(
            "component",
            "pos",
            F.round("loading", 6).alias("loading"),
            F.round("eigval", 6).alias("eigval"),
        )
        .orderBy("component", "pos")
    )

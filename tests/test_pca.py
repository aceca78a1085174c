"""top_principal_component (operators/pca.py) — robustness + the
DECIMAL(38,0) exact-moment path.

The oracle-parity proof for the contract query lives in the driver gate
(embedding_top_pc); these tests pin the operator's edge behavior:
moment sums past the int64 cap, ragged/null-vector exclusion, empty
input, and the inconsistent-moment guard.
"""

from __future__ import annotations

import math

import pytest

from netflix_data_ingestion_spark.operators.pca import (
    _power_iterate,
    top_principal_component,
)


def _expected(vectors, dim, iters, scale):
    """Pure-Python int-exact replication of the documented spec: exact
    integer moments (unbounded Python ints stand in for DECIMAL(38,0)),
    then the module's own deterministic float iteration."""
    qs = [[round(x * scale) for x in v] for v in vectors]
    n = len(qs)
    s1 = [sum(q[i] for q in qs) for i in range(dim)]
    s2 = [
        [sum(q[i] * q[j] for q in qs) for j in range(dim)]
        for i in range(dim)
    ]
    d2, d1 = float(n * scale * scale), float(n * scale)
    cov = [
        [s2[i][j] / d2 - (s1[i] / d1) * (s1[j] / d1) for j in range(dim)]
        for i in range(dim)
    ]
    return _power_iterate(cov, dim, iters)


def test_moment_sums_exact_past_int64(spark):
    """scale=1e9 puts single pair products at 4e18; three rows push the
    diagonal moment sums to 1.2e19 > int64 max. The DECIMAL(38,0)
    accumulation must stay exact (an int64 sum would overflow)."""
    vecs = [[2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]]
    df = spark.createDataFrame(
        [(v,) for v in vecs], "embedding array<double>"
    )
    got = top_principal_component(
        df, dim=2, iters=8, scale=1_000_000_000
    ).collect()
    v, eig = _expected(vecs, 2, 8, 1_000_000_000)
    assert [r["pos"] for r in got] == [1, 2]
    for r, exp in zip(got, v):
        assert r["loading"] == pytest.approx(exp, abs=1e-6)
        assert r["eigval"] == pytest.approx(eig, abs=1e-6)
    # sanity: the diagonal moment really exceeds int64
    q = round(2.0 * 1_000_000_000)
    assert 3 * q * q > 2**63 - 1


def test_ragged_and_null_vectors_excluded(spark):
    """Rows whose vector is NULL, wrong-length, or carries a NULL
    component must not contribute to any moment."""
    # NOT the cyclic permutations of one vector: those center to a
    # circulant covariance whose nullspace contains the all-ones start
    # iterate (C @ 1 = 0 -> zero-norm first step).
    good = [[1.0, 2.0, 3.0], [3.0, 1.5, 2.0], [2.0, 3.0, 1.0], [0.5, 1.0, 2.5]]
    rows = (
        [(v,) for v in good]
        + [(None,), ([1.0, 2.0],), ([1.0, None, 3.0],)]
    )
    df = spark.createDataFrame(rows, "embedding array<double>")
    got = top_principal_component(df, dim=3, iters=8).collect()
    clean = top_principal_component(
        spark.createDataFrame([(v,) for v in good], "embedding array<double>"),
        dim=3,
        iters=8,
    ).collect()
    assert [(r["pos"], r["loading"], r["eigval"]) for r in got] == [
        (r["pos"], r["loading"], r["eigval"]) for r in clean
    ]
    loadings = [r["loading"] for r in got]
    assert abs(math.sqrt(sum(x * x for x in loadings)) - 1.0) < 1e-4


def test_empty_input_returns_empty_frame(spark):
    df = spark.createDataFrame([], "embedding array<double>")
    out = top_principal_component(df, dim=4, iters=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "pos",
        "loading",
        "eigval",
    ]
    # all-filtered input (only ragged rows) takes the same path
    df2 = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    assert top_principal_component(df2, dim=4, iters=8).count() == 0

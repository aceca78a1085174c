"""Property test for the cosine-LSH recall claim (operators/dedup.py).

The docstring math on cosine_lsh_candidate_pairs is load-bearing for the
production semantic dedup's recall: a pair at angle θ survives one
`planes`-bit table with probability (1-θ/π)^planes, OR-amplified across
`tables` independent tables to p_pair = 1-(1-(1-θ/π)^planes)^tables.

The hyperplanes are deterministic (md5-derived), so for a FIXED corpus
recall is deterministic; the randomness is the corpus.  Hypothesis draws
corpora of planted near-dup pairs, the audit twin (exact all-pairs)
provides ground truth, and we assert:

- recall >= mean analytic per-pair bound minus a wide anti-flake margin
  (the planted pairs sit at cosine ~0.95+, where the 6x8 default
  predicts >=99% recall — the margin leaves ~7 sigma of binomial room);
- precision is EXACT: the scale path's surviving pairs are a subset of
  the audit twin's with identical rounded cosines (verification is an
  exact rescore, LSH only gates candidates).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from netflix_data_ingestion_spark.operators import dedup

DIM = 16
PLANES = 6
TABLES = 8
THRESHOLD = 0.9


def _corpus(seed: int, n_pairs: int):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_pairs):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        noise = rng.standard_normal(DIM) * 0.1
        dup = base + noise
        dup /= np.linalg.norm(dup)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in dup]))
    # decoys: random directions, overwhelmingly below the threshold
    for j in range(n_pairs):
        v = rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append((10_000 + j, [float(x) for x in v]))
    return rows


def _pair_bound(cos: float) -> float:
    theta = math.acos(max(-1.0, min(1.0, cos)))
    p1 = (1.0 - theta / math.pi) ** PLANES
    return 1.0 - (1.0 - p1) ** TABLES


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_scale_cosine_dedup_recall_meets_docstring_bound(spark, seed):
    rows = _corpus(seed, n_pairs=30)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    audit = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dedup.cosine_near_dup_pairs(
            df, threshold=THRESHOLD
        ).collect()
    }
    scale = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in dedup.cosine_near_dup_pairs_at_scale(
            df,
            threshold=THRESHOLD,
            planes=PLANES,
            tables=TABLES,
            dim=DIM,
        ).collect()
    }

    # precision: exact rescore — subset with identical cosines
    for pair, cos in scale.items():
        assert pair in audit and audit[pair] == cos

    # recall vs the analytic bound (mean over the true pairs' own cosines)
    assert audit, "corpus must plant pairs above the threshold"
    bound = sum(_pair_bound(c) for c in audit.values()) / len(audit)
    recall = len(set(scale) & set(audit)) / len(audit)
    # bound is ~0.99 here; 0.12 of slack is ~7 binomial sigma at n>=30
    assert recall >= bound - 0.12, (
        f"recall {recall:.3f} below documented bound {bound:.3f} - 0.12"
    )

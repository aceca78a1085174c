"""Round-6 contract additions: hard negatives, GK quantile bounds, BPE
merge-table contract shape (oracle parity is covered by the driver gate
and tools/check_correctness.py; these pin the operator semantics)."""

from __future__ import annotations

from netflix_data_ingestion_spark.plans.contract import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hard_negatives_excludes_own_label_and_ranks(spark):
    fn, _ = REGISTRY["label_hard_negatives"]
    rows = fn(spark, SF).collect()
    assert rows, "expected at least one labeled embedding group"
    per_label: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_label"] != r["label"]
        per_label.setdefault(r["label"], []).append(r)
    for label, grp in per_label.items():
        ranks = [r["rank"] for r in grp]
        assert ranks == list(range(1, len(grp) + 1))
        sims = [r["cosine_sim"] for r in grp]
        assert sims == sorted(sims, reverse=True)
        assert len(grp) <= 10


def test_gk_quantiles_within_bound_and_ordered(spark):
    fn, _ = REGISTRY["order_price_gk_quantiles"]
    rows = fn(spark, SF).collect()
    assert [r["q_pct"] for r in rows] == [25, 50, 75, 90]
    # exact nearest-rank picks are monotone in q
    vals = [r["exact_cents"] for r in rows]
    assert vals == sorted(vals)
    # the GK guarantee must hold on every quantile
    assert all(r["gk_within_bound"] for r in rows)


def test_bpe_segmented_counts_consistent(spark):
    fn, _ = REGISTRY["doc_bpe_segmented"]
    rows = fn(spark, SF).collect()
    assert len(rows) == 500  # one row per document
    for r in rows:
        # merging only ever shrinks a word's symbol count, and every
        # pretoken contributes at least one token; the char+EOW upper
        # bound holds before any merge
        assert 0 <= r["n_pretokens"]
        if r["n_pretokens"]:
            assert r["n_bpe_tokens"] >= r["n_pretokens"]
        else:
            assert r["n_bpe_tokens"] == 0


def test_top_pc_unit_norm_and_dominant(spark):
    import math

    fn, _ = REGISTRY["embedding_top_pc"]
    rows = fn(spark, SF).collect()
    assert [r["pos"] for r in rows] == list(range(1, 65))
    loadings = [r["loading"] for r in rows]
    # unit norm (up to the 1e-6 output rounding)
    assert abs(math.sqrt(sum(x * x for x in loadings)) - 1.0) < 1e-4
    eig = rows[0]["eigval"]
    assert all(r["eigval"] == eig for r in rows)
    # the top eigenvalue of a covariance is at least the max diagonal
    # variance share it explains must be positive
    assert eig > 0


def test_power_iterate_matches_numpy_eig():
    """The deterministic 8-step iterate must be numerically close to the
    true dominant eigenpair on a well-separated matrix (numpy is the
    independent oracle; exact SQL parity is the driver gate's job)."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.pca import _power_iterate

    rng = np.random.default_rng(42)
    a = rng.normal(size=(6, 6))
    cov = (a @ a.T).tolist()  # SPD with generically separated spectrum
    v, eig = _power_iterate(cov, 6, 60)
    w, vecs = np.linalg.eigh(np.array(cov))
    assert abs(eig - w[-1]) < 1e-8 * max(1.0, abs(w[-1]))
    top = vecs[:, -1]
    cosang = abs(float(np.dot(top, np.array(v))))
    assert cosang > 1 - 1e-10


def test_bpe_merges_contract_shape(spark):
    fn, _ = REGISTRY["corpus_bpe_merges"]
    rows = fn(spark, SF).collect()
    assert [r["merge_idx"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]
        # contract runs min_pair_count=1 (oracle parity: the SQL twin
        # merges whatever pair wins the round, even a count-1 pair)
        assert r["pair_count"] >= 1
    # merge counts never increase between rounds IF a later round's best
    # pair existed unchanged earlier -- not a theorem for all corpora, so
    # pin only the invariant that counts stay positive and the table is
    # deduplicated
    assert len({(r["lhs"], r["rhs"]) for r in rows}) == len(rows)

"""Property-based invariants for the round-4 relational operators:
interval union vs a sweep-line oracle, and distributed global rank vs
the single-partition definition — for ANY generated input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

intervals_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=1,
    max_size=40,
)


def _sweep_line(rows):
    """Python oracle: per key, sort by (start, end) and sweep."""
    out = {}
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, spans in by_key.items():
        merged = []
        for s, e in sorted(spans):
            if merged and s <= merged[-1][1]:
                ps, pe, n = merged[-1]
                merged[-1] = (ps, max(pe, e), n + 1)
            else:
                merged.append((s, e, 1))
        out[k] = merged
    return {
        (k, s): (e, n) for k, spans in out.items() for s, e, n in spans
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=intervals_strategy)
def test_merge_intervals_matches_sweep_line(spark, raw):
    from netflix_data_ingestion_spark.operators.intervals import (
        merge_intervals,
    )

    rows = [(k, s, s + d) for k, s, d in raw]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = {
        (r["k"], r["period_start"]): (r["period_end"], r["n_intervals"])
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == _sweep_line(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5), min_size=1, max_size=60
    )
)
def test_global_rank_is_the_sorted_position(spark, vals):
    from netflix_data_ingestion_spark.operators.profile import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(5)
    got = {
        r["id"]: r["rank"] for r in global_rank(df, "v", "id").collect()
    }
    want = {
        rid: rank
        for rank, (v, rid) in enumerate(
            sorted((v, rid) for rid, v in rows), start=1
        )
    }
    assert got == want


pack_corpus_strategy = st.lists(
    st.integers(min_value=0, max_value=40),  # token count per doc
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=pack_corpus_strategy, window=st.sampled_from([4, 8, 16]))
def test_pack_windows_invariants_any_corpus(spark, counts, window):
    """For ANY corpus: every window except the last is exactly full,
    every doc is covered by contiguous slices, totals conserve."""
    from netflix_data_ingestion_spark.operators.packing import pack_windows

    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_windows(df, "doc_id", "text", window=window).collect()
    total = sum(counts)
    per_window = {}
    per_doc = {}
    for r in out:
        assert r["n_toks"] > 0
        per_window[r["window_id"]] = (
            per_window.get(r["window_id"], 0) + r["n_toks"]
        )
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_start_tok"], r["n_toks"])
        )
    assert sum(per_window.values()) == total
    if total:
        last = max(per_window)
        assert set(per_window) == set(range(last + 1))
        for w, filled in per_window.items():
            assert filled == window or w == last
    for i, n in enumerate(counts):
        if n == 0:
            assert i not in per_doc
            continue
        pos = 0
        for start, ln in sorted(per_doc[i]):
            assert start == pos
            pos += ln
        assert pos == n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=30), min_size=1, max_size=5
    )
)
def test_balanced_oversample_exact_targets_any_classes(spark, sizes):
    """For ANY class-size profile: every class lands exactly on the
    majority size, and per-row copy counts differ by at most one."""
    from netflix_data_ingestion_spark.operators.sample import (
        balanced_oversample,
    )

    rows = [
        (cls * 1000 + i, f"c{cls}")
        for cls, n in enumerate(sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = balanced_oversample(df, "lang", "doc_id").collect()
    target = max(sizes)
    per_class = {}
    per_doc = {}
    for r in out:
        per_class[r["lang"]] = per_class.get(r["lang"], 0) + 1
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), r["copy_idx"])
    assert all(n == target for n in per_class.values())
    for cls, n in enumerate(sizes):
        copies = [per_doc[cls * 1000 + i] for i in range(n)]
        assert max(copies) - min(copies) <= 1
        assert sum(copies) == target


corpus_strategy = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]),
        min_size=0,
        max_size=15,
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_strategy)
def test_containment_sound_and_complete_at_full_df(spark, docs):
    """For ANY corpus: containment_pairs is SOUND (every reported pair
    really satisfies the containment definition on distinct shingles)
    and, with max_df >= n_docs (blocking disabled), COMPLETE vs the
    brute-force definition."""
    from netflix_data_ingestion_spark.operators.dedup import (
        containment_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 2
    got = {
        (r["id_a"], r["id_b"]): (r["intersection"], r["containment"])
        for r in containment_pairs(
            df, "doc_id", "text", n=n, threshold=0.8, max_df=len(docs)
        ).collect()
    }

    def sh(toks):
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    shingles = {i: sh(toks) for i, toks in enumerate(docs)}
    expect = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = shingles[a], shingles[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            c = inter / min(len(sa), len(sb))
            if c >= 0.8:
                expect[(a, b)] = (inter, c)
    assert set(got) == set(expect)
    for k, (inter, c) in expect.items():
        assert got[k][0] == inter and abs(got[k][1] - c) < 1e-12


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_counts_match_bruteforce_any_graph(spark, edges):
    """For ANY multigraph (self-loops and duplicate/reversed edges
    included): degree-ordered wedge counting equals brute-force
    triangle enumeration."""
    from netflix_data_ingestion_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    simple = {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }
    nodes = {n for e in simple for n in e}
    expect = {}
    for a in sorted(nodes):
        for b in sorted(n for n in nodes if n > a):
            for c in sorted(n for n in nodes if n > b):
                if (
                    (a, b) in simple
                    and (b, c) in simple
                    and (a, c) in simple
                ):
                    for n in (a, b, c):
                        expect[n] = expect.get(n, 0) + 1
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=2,
        max_size=60,
    )
)
def test_winsorize_bounds_and_interior_identity(spark, vals):
    """For ANY value set: winsorized outputs lie inside [p_lo, p_hi],
    interior values pass through unchanged, and the bounds are real
    data points (nearest-rank selections)."""
    import math

    from netflix_data_ingestion_spark.operators.outliers import winsorize

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, rid long, v double")
    got = {
        r["rid"]: r["v_winsorized"]
        for r in winsorize(df, ["grp"], "v", lo_q=0.1, hi_q=0.9).collect()
    }
    n = len(vals)
    ordered = sorted(float(v) for v in vals)
    lo = ordered[math.ceil(0.1 * n) - 1]
    hi = ordered[math.ceil(0.9 * n) - 1]
    for i, v in enumerate(vals):
        w = got[i]
        assert lo <= w <= hi
        if lo <= v <= hi:
            assert w == float(v)        # interior identity
        elif v < lo:
            assert w == lo              # clipped to a real data point
        else:
            assert w == hi


# --- prefix-filter Jaccard join: lossless vs the all-pairs definition ----
#
# Random corpora drawn from a SMALL vocabulary so near-duplicates and
# threshold-boundary pairs actually occur; equality against the
# quadratic all-pairs join for ANY corpus is the losslessness claim of
# the PPJoin prefix bound (docstring, operators/dedup.py).

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["red", "blue", "green", "ox", "ant", "elm"]),
        min_size=0,
        max_size=12,
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_prefix_jaccard_lossless_on_random_corpora(spark, docs):
    from netflix_data_ingestion_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    ap = sorted(
        (r["id_a"], r["id_b"], r["intersection"])
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.6
        ).collect()
    )
    pf = sorted(
        (r["id_a"], r["id_b"], r["intersection"])
        for r in dedup.prefix_jaccard_pairs(
            df, "doc_id", "text", n=2, t_num=3, t_den=5
        ).collect()
    )
    assert ap == pf


# --- label propagation: synchronous-update replica on random graphs ------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


def _lpa_replica(edges, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_label_propagation_matches_python_replica(spark, edges):
    from netflix_data_ingestion_spark.operators.graph import (
        label_propagation,
    )

    if all(a == b for a, b in edges):
        return  # no real edges -> empty graph, nothing to compare
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=3).collect()
    }
    assert got == _lpa_replica(edges, 3)


# ---------------------------------------------------------------------------
# Distributed-rank family (keys.ntile_ranged / keys.prefix_sum_ranged /
# profile.exact_quantiles_ranged) vs single-node Python oracles
# ---------------------------------------------------------------------------

ranked_values = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=ranked_values,
    k=st.sampled_from([1, 2, 3, 7, 10]),
    nparts=st.sampled_from([2, 5, 9]),
)
def test_ntile_ranged_matches_python_oracle(spark, vals, k, nparts):
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["uid", "v"])
    got = {
        r["uid"]: r["b"]
        for r in ntile_ranged(
            df,
            [F.col("v").asc(), F.col("uid").asc()],
            k,
            "b",
            num_partitions=nparts,
        ).collect()
    }
    # oracle: sort, then SQL NTILE bucket arithmetic
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(order)
    q, rem = divmod(n, k)
    want = {}
    for pos, (uid, _) in enumerate(order, start=1):
        if q == 0:
            want[uid] = pos
        elif pos <= (q + 1) * rem:
            want[uid] = (pos + q) // (q + 1)
        else:
            want[uid] = rem + (pos - (q + 1) * rem + q - 1) // q
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=ranked_values, nparts=st.sampled_from([2, 5, 9]))
def test_prefix_sum_ranged_matches_python_oracle(spark, vals, nparts):
    from netflix_data_ingestion_spark.operators.keys import (
        prefix_sum_ranged,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["uid", "v"])
    got = {
        r["uid"]: r["pre"]
        for r in prefix_sum_ranged(
            df, ["uid"], "v", "pre", num_partitions=nparts
        ).collect()
    }
    acc, want = 0, {}
    for uid, v in rows:  # uid order IS the total order here
        want[uid] = acc
        acc += v
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=ranked_values, nparts=st.sampled_from([2, 5, 9]))
def test_exact_quantiles_ranged_matches_python_oracle(spark, vals, nparts):
    import math

    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles_ranged,
    )

    qs = (0.25, 0.5, 0.75, 0.9)
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    row = exact_quantiles_ranged(
        df, "v", qs=qs, num_partitions=nparts
    ).collect()[0]
    order = sorted(vals)
    assert row["n"] == len(order)
    for q in qs:
        want = order[max(1, math.ceil(q * len(order))) - 1]
        assert row[f"p{int(round(q * 100))}"] == want, q

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

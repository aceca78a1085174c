"""As-of join: union/forward-fill vs cogrouped merge_asof equivalence."""

from __future__ import annotations

from datetime import datetime

from netflix_data_ingestion_spark.operators.asof import (
    asof_join,
    asof_join_cogrouped,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


LEFT = [
    (1, 10, _ts("2024-01-01T00:05:00")),   # after r100 -> matches r100
    (2, 10, _ts("2024-01-01T00:10:00")),   # exactly at r101 -> inclusive
    (3, 10, _ts("2024-01-01T00:00:30")),   # before any right -> NULL
    (4, 20, _ts("2024-01-01T09:00:00")),   # key with no right rows -> NULL
]
RIGHT = [
    (100, 10, _ts("2024-01-01T00:01:00"), 1.5),
    (101, 10, _ts("2024-01-01T00:10:00"), 2.5),
    (102, 30, _ts("2024-01-01T00:00:00"), 9.9),  # key absent from left
]


def _frames(spark):
    left = spark.createDataFrame(
        LEFT, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        RIGHT, "event_id long, user_id long, ts timestamp, value double"
    )
    return left, right


EXPECTED = {
    1: (100, 1.5),
    2: (101, 2.5),
    3: (None, None),
    4: (None, None),
}


def test_asof_join_union_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), prefix="m_",
    ).collect()
    got = {r["event_id"]: (r["m_event_id"], r["m_value"]) for r in out}
    assert got == EXPECTED
    assert len(out) == len(LEFT)  # left join: every left row survives


def test_asof_join_cogrouped_matches_union(spark):
    left, right = _frames(spark)
    a = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), prefix="m_",
    )
    b = asof_join_cogrouped(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), prefix="m_",
    )
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
    assert a.columns == b.columns


def test_asof_forward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), prefix="m_",
        direction="forward",
    ).collect()
    got = {r["event_id"]: (r["m_event_id"], r["m_value"]) for r in out}
    assert got == {
        1: (101, 2.5),     # next right after 00:05 is r101 at 00:10
        2: (101, 2.5),     # exactly at r101 -> inclusive
        3: (100, 1.5),     # before any right -> earliest subsequent
        4: (None, None),   # key with no right rows
    }


def test_asof_nearest_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), prefix="m_",
        direction="nearest",
    ).collect()
    got = {r["event_id"]: r["m_event_id"] for r in out}
    # event 1 at 00:05: r100 is 4 min back, r101 is 5 min ahead -> r100
    assert got == {1: 100, 2: 101, 3: 100, 4: None}


def test_asof_nearest_int64_above_double_mantissa(spark):
    """nearest on int64 keys above 2^53 must use exact integer
    distances: at t = 2^53+3 with neighbors at 2^53+1 and 2^53+5 the
    true distances tie (2 vs 2, backward wins), but a double round-trip
    maps 2^53+3 and 2^53+5 to the same value (2^53+4 is the nearest
    representable even) and 2^53+1 down to 2^53, so double arithmetic
    sees d_back=4 > d_fwd=0 and flips the winner to forward."""
    base = 1 << 53
    left = spark.createDataFrame(
        [(1, 10, base + 3)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(100, 10, base + 1, 1.0), (101, 10, base + 5, 2.0)],
        "event_id long, user_id long, ts long, value double",
    )
    out = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id",), prefix="m_", direction="nearest",
    ).collect()
    assert len(out) == 1 and out[0]["m_event_id"] == 100  # backward tie-win
    cog = asof_join_cogrouped(
        left, right, on="ts", by=("user_id",),
        right_cols=("event_id",), prefix="m_", direction="nearest",
    ).collect()
    assert cog[0]["m_event_id"] == 100


def test_asof_unknown_direction_rejected(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")


def test_asof_all_directions_match_merge_asof(spark):
    """Randomized cross-check: the union/window implementation must
    equal the cogrouped pd.merge_asof twin in every direction —
    including the exact-tie case for nearest (backward wins, pandas
    parity)."""
    import random

    rng = random.Random(11)
    left_rows = [
        (i, rng.randint(1, 4), float(rng.randint(0, 200)))
        for i in range(120)
    ]
    # right timestamps UNIQUE (the operator's documented determinism
    # precondition) and even-valued: an odd left timestamp sits exactly
    # between two rights -> the nearest exact-tie case is exercised
    right_rows = [
        (1000 + i, rng.randint(1, 4), float(2 * i), i * 1.0)
        for i in range(80)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts double"
    )
    right = spark.createDataFrame(
        right_rows, "event_id long, user_id long, ts double, value double"
    )
    for direction in ("backward", "forward", "nearest"):
        a = asof_join(
            left, right, on="ts", by=("user_id",),
            right_cols=("value",), prefix="m_", direction=direction,
        )
        b = asof_join_cogrouped(
            left, right, on="ts", by=("user_id",),
            right_cols=("value",), prefix="m_", direction=direction,
        )
        key = lambda r: tuple(str(x) for x in r)
        assert sorted(map(key, a.collect())) == sorted(
            map(key, b.collect())
        ), direction

"""SCD Type-2 history (operators/scd.py)."""

import datetime

from netflix_data_ingestion_spark.operators.scd import scd2_history


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_scd2_runs_and_intervals(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0), "view"),
            (1, _ts(1), "view"),   # consecutive dup — collapses
            (1, _ts(2), "click"),
            (1, _ts(3), "view"),   # back to view — NEW run, not merged
            (2, _ts(5), "error"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = sorted(
        scd2_history(df, "user_id", "ts", "event_type").collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [(r["state"], r["version"]) for r in u1] == [
        ("view", 1), ("click", 2), ("view", 3),
    ]
    # intervals chain: valid_to of run k == valid_from of run k+1
    assert u1[0]["valid_from"] == _ts(0) and u1[0]["valid_to"] == _ts(2)
    assert u1[1]["valid_to"] == _ts(3)
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"] and not u1[1]["is_current"]

    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["version"] == 1


def test_scd2_null_states_are_runs(spark):
    """NULL attribute values open/close runs like any other state
    (null-safe change detection), and a key whose FIRST state is NULL
    still gets its version-1 row."""
    df = spark.createDataFrame(
        [
            (1, _ts(0), "view"),
            (1, _ts(1), None),     # transition INTO NULL — new run
            (1, _ts(2), None),     # consecutive NULL dup — collapses
            (1, _ts(3), "click"),  # transition OUT of NULL — new run
            (2, _ts(0), None),     # first state is NULL — kept
            (2, _ts(1), "view"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = sorted(
        scd2_history(df, "user_id", "ts", "event_type").collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    u1 = [(r["state"], r["version"]) for r in rows if r["user_id"] == 1]
    assert u1 == [("view", 1), (None, 2), ("click", 3)]
    u1r = [r for r in rows if r["user_id"] == 1]
    assert u1r[1]["valid_from"] == _ts(1) and u1r[1]["valid_to"] == _ts(3)
    u2 = [(r["state"], r["version"]) for r in rows if r["user_id"] == 2]
    assert u2 == [(None, 1), ("view", 2)]

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


def test_pit_enrich_picks_the_version_valid_at_event_time(spark):
    import datetime as dt

    from netflix_data_ingestion_spark.operators.scd import (
        pit_enrich,
        scd2_history,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, 7, t(0), "free"),
            (2, 7, t(10), "free"),
            (3, 7, t(20), "paid"),   # transition event -> new version
            (4, 7, t(30), "paid"),
            (5, 8, t(5), "trial"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    hist = scd2_history(ev, "user_id", "ts", "event_type").withColumnRenamed(
        "state", "state_at"
    )
    out = {
        r["event_id"]: (r["state_at"], r["version"])
        for r in pit_enrich(
            ev.select("event_id", "user_id", "ts"),
            hist,
            "user_id",
            "ts",
            ["state_at", "version"],
            bucket_width_s=60,  # small buckets: multi-bucket versions
        ).collect()
    }
    assert out == {
        1: ("free", 1),
        2: ("free", 1),
        3: ("paid", 2),  # boundary event belongs to the NEW version
        4: ("paid", 2),
        5: ("trial", 1),
    }
    # exactly one version per fact (SCD2 non-overlap preserved)
    assert len(out) == 5


def test_pit_enrich_is_a_hash_join(spark):
    import datetime as dt

    from netflix_data_ingestion_spark.operators.scd import (
        pit_enrich,
        scd2_history,
    )

    ev = spark.createDataFrame(
        [(i, i % 3, dt.datetime(2024, 1, 1, 0, i), "s") for i in range(30)],
        ["event_id", "user_id", "ts", "event_type"],
    )
    hist = scd2_history(ev, "user_id", "ts", "event_type")
    plan = (
        pit_enrich(
            ev.select("event_id", "user_id", "ts"),
            hist,
            "user_id",
            "ts",
            ["state", "version"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ONLY nested-loop allowed is the 1-row cap-bound crossJoin;
    # the (key, bucket) join itself must be a hash join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan

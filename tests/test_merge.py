"""MERGE upsert between snapshots (operators/merge.py)."""

from netflix_data_ingestion_spark.operators.merge import merge_upsert


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, seg string, bal double",
    )
    updates = spark.createDataFrame(
        [
            (2, "B2", None, False),   # update — NULL bal must WIN (whole-row)
            (4, "d", 40.0, False),    # insert
            (3, None, None, True),    # delete
        ],
        "k long, seg string, bal double, deleted boolean",
    )
    return target, updates


def test_merge_update_insert_delete(spark):
    target, updates = _frames(spark)
    rows = {
        r["k"]: r
        for r in merge_upsert(
            target, updates, ["k"], tombstone_col="deleted"
        ).collect()
    }
    assert set(rows) == {1, 2, 4}          # 3 deleted, 4 inserted
    assert rows[1]["seg"] == "a" and rows[1]["bal"] == 10.0   # untouched
    assert rows[2]["seg"] == "B2"
    assert rows[2]["bal"] is None          # update's NULL overrides 20.0
    assert rows[4]["seg"] == "d" and rows[4]["bal"] == 40.0


def test_merge_without_tombstones(spark):
    target, updates = _frames(spark)
    rows = merge_upsert(target, updates.drop("deleted"), ["k"]).collect()
    assert {r["k"] for r in rows} == {1, 2, 3, 4}
    by_k = {r["k"]: r for r in rows}
    # without tombstone handling the delete row is just an upsert
    assert by_k[3]["seg"] is None and by_k[3]["bal"] is None


def test_snapshot_diff_classifies_and_roundtrips(spark):
    from netflix_data_ingestion_spark.operators.merge import snapshot_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (5, None, 50.0),   # NULL -> value must count as an update
            (6, "f", 60.0),    # unchanged: must be omitted
        ],
        "k long, seg string, bal double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "B2", None),   # update incl. value -> NULL
            (4, "d", 40.0),    # insert
            (5, "e", 50.0),    # NULL -> value update
            (6, "f", 60.0),    # unchanged
        ],
        "k long, seg string, bal double",
    )
    diff = snapshot_diff(old, new, ["k"], ["seg", "bal"])
    by_k = {r["k"]: r for r in diff.collect()}
    assert {k: r["change_type"] for k, r in by_k.items()} == {
        2: "update", 3: "delete", 4: "insert", 5: "update"
    }
    assert by_k[2]["seg"] == "B2" and by_k[2]["bal"] is None
    assert by_k[3]["seg"] is None and by_k[3]["bal"] is None

    # inverse property: applying the feed back via MERGE reproduces `new`
    feed = diff.withColumn("deleted", F.col("change_type") == "delete").drop(
        "change_type"
    )
    merged = merge_upsert(old, feed, ["k"], tombstone_col="deleted")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_merge_aggregates_one_sided_keys_and_combines(spark):
    from netflix_data_ingestion_spark.operators.merge import merge_aggregates

    a = spark.createDataFrame(
        [("d1", 2, 10, 1.0, 5.0), ("d2", 1, 7, 2.0, 2.0)],
        "day string, n long, s long, mn double, mx double",
    )
    b = spark.createDataFrame(
        [("d1", 3, 4, 0.5, 9.0), ("d3", 4, 1, 3.0, 3.0)],
        "day string, n long, s long, mn double, mx double",
    )
    out = {
        r["day"]: r
        for r in merge_aggregates(
            a, b, ["day"], sum_cols=["n", "s"], min_cols=["mn"], max_cols=["mx"]
        ).collect()
    }
    assert out["d1"]["n"] == 5 and out["d1"]["s"] == 14
    assert out["d1"]["mn"] == 0.5 and out["d1"]["mx"] == 9.0
    # one-sided keys pass through untouched
    assert (out["d2"]["n"], out["d2"]["s"]) == (1, 7)
    assert (out["d3"]["n"], out["d3"]["s"]) == (4, 1)


def test_incremental_join_delta_equals_recompute_diff(spark):
    from netflix_data_ingestion_spark.operators.merge import (
        incremental_join_delta,
    )

    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(30)], "k long, av string"
    )
    b = spark.createDataFrame(
        [(k % 20, f"b{i}") for i, k in enumerate(range(60))],
        "k long, bv string",
    )
    base_a, delta_a = a.filter("k % 3 != 0"), a.filter("k % 3 = 0")
    base_b, delta_b = b.filter("k % 4 != 0"), b.filter("k % 4 = 0")
    got = incremental_join_delta(base_a, delta_a, base_b, delta_b, ["k"])
    full = a.join(b, ["k"])
    old = base_a.join(base_b, ["k"])
    expect = full.exceptAll(old)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # empty increments produce an empty delta
    none = incremental_join_delta(
        a, a.limit(0), b, b.limit(0), ["k"]
    ).count()
    assert none == 0
    # everything-is-new degenerates to the full join
    allnew = incremental_join_delta(
        a.limit(0), a, b.limit(0), b, ["k"]
    )
    assert sorted(map(tuple, allnew.collect())) == sorted(
        map(tuple, full.collect())
    )

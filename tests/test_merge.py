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

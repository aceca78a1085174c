"""Right-to-be-forgotten cascade (operators/forget.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.forget import (
    forget_audit,
    forget_keys,
)


def _fixtures(spark):
    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "uid long, name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, None)],
        "oid long, uid long",
    )
    items = spark.createDataFrame(
        [(10, "x"), (10, "y"), (12, "z"), (99, "w")],
        "oid long, sku string",
    )
    forget = spark.createDataFrame([(1,)], "uid long")
    return users, orders, items, forget


def test_forget_cascade_reaches_grandchildren(spark):
    users, orders, items, forget = _fixtures(spark)
    kept_orders, removed_oids = forget_keys(
        orders, "uid", forget, "uid", emit_col="oid"
    )
    kept_items, _ = forget_keys(items, "oid", removed_oids, "oid")
    assert sorted(r["oid"] for r in kept_orders.collect()) == [12, 13]
    assert sorted(r["oid"] for r in removed_oids.collect()) == [10, 11]
    # items of order 10 gone; unrelated and orphan rows kept
    assert sorted(r["oid"] for r in kept_items.collect()) == [12, 99]


def test_forget_null_fk_is_kept(spark):
    _, orders, _, forget = _fixtures(spark)
    kept, _ = forget_keys(orders, "uid", forget, "uid")
    assert 13 in {r["oid"] for r in kept.collect()}


def test_forget_audit_counts_balance(spark):
    users, orders, items, forget = _fixtures(spark)
    _, removed_oids = forget_keys(
        orders, "uid", forget, "uid", emit_col="oid"
    )
    audit = {
        r["table_name"]: (r["rows_before"], r["rows_removed"], r["rows_after"])
        for r in forget_audit(
            [
                ("users", users, "uid", forget, "uid"),
                ("orders", orders, "uid", forget, "uid"),
                ("items", items, "oid", removed_oids, "oid"),
            ]
        ).collect()
    }
    assert audit == {
        "users": (3, 1, 2),
        "orders": (4, 2, 2),
        "items": (4, 2, 2),
    }
    assert all(b == r + a for b, r, a in audit.values())

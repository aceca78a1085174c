"""Order-invariant table digest (operators/digest.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.digest import table_digest


def _row(df):
    r = df.collect()[0]
    return r["n_rows"], r["digest"]


def test_digest_invariant_to_order_and_partitioning(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, val string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, val string")
    assert _row(table_digest(a)) == _row(table_digest(b))
    assert _row(table_digest(a.repartition(13))) == _row(table_digest(a))


def test_digest_detects_single_cell_change_and_null_vs_empty(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, val string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "id long, val string")
    c = spark.createDataFrame([(1, "x"), (2, None)], "id long, val string")
    d = spark.createDataFrame([(1, "x"), (2, "")], "id long, val string")
    digests = {_row(table_digest(x)) for x in (a, b, c, d)}
    assert len(digests) == 4  # all distinguishable, incl. NULL vs ''


def test_digest_column_subset_and_order_matter(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, val string")
    full = _row(table_digest(df))
    subset = _row(table_digest(df, ["id"]))
    swapped = _row(table_digest(df, ["val", "id"]))
    assert full != subset and full != swapped


def test_digest_is_mergeable_across_shards(spark):
    """digest(A ∪ B) == digest(A) + digest(B) — shards can be hashed
    independently (even by different clusters) and combined by plain
    addition; this is the cross-system merge contract."""
    a = spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                              "id long, val string")
    b = spark.createDataFrame([(i, f"v{i}") for i in range(50, 80)],
                              "id long, val string")
    na, da = _row(table_digest(a))
    nb, db = _row(table_digest(b))
    nu, du = _row(table_digest(a.unionAll(b)))
    assert nu == na + nb
    assert int(du) == int(da) + int(db)

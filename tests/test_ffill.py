"""forward_fill operators (reference primitive etl_pipeline_spark.py:1114-1122)."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.ffill import (
    forward_fill_global,
    forward_fill_grouped,
)


def test_grouped_fill(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, 10),
        ("a", 3, None),
        ("b", 1, None),
        ("b", 2, 20),
    ]
    df = spark.createDataFrame(rows, "k string, ord int, v int")
    out = forward_fill_grouped(df, ["k"], ["ord"], "v", "filled")
    got = {(r["k"], r["ord"]): r["filled"] for r in out.collect()}
    assert got == {
        ("a", 1): None,
        ("a", 2): 10,
        ("a", 3): 10,
        ("b", 1): None,
        ("b", 2): 20,
    }


def test_global_fill_across_partitions(spark):
    # values only in early rows; many partitions; later partitions must
    # receive the carry-in (the §4.4 bucket-boundary case)
    n = 5000
    rows = [(i, 111 if i == 7 else (222 if i == 2500 else None)) for i in range(n)]
    df = spark.createDataFrame(rows, "ord long, v int").repartitionByRange(8, "ord")
    out = forward_fill_global(df, "ord", "v", "filled").collect()
    got = {r["ord"]: r["filled"] for r in out}
    assert got[6] is None
    assert got[7] == 111
    assert got[2499] == 111
    assert got[2500] == 222
    assert got[n - 1] == 222


def test_global_fill_empty_partitions_ok(spark):
    df = (
        spark.range(0)
        .withColumn("v", F.lit(None).cast("int"))
        .withColumnRenamed("id", "ord")
    )
    assert forward_fill_global(df, "ord", "v", "filled").count() == 0


def test_deterministic_arrow_path_matches_window_path(spark, tmp_path):
    """The deterministic_source fast path (narrow Arrow LOCF, no
    exchange) must agree row-for-row with the pinned window path on a
    REAL multi-split file scan — including the leading-null run of a
    partition whose carry-in comes from two partitions back, and a
    NULL-headed file start that must stay NULL (never garbage: the
    float64->Int32 masked conversion case)."""
    p = tmp_path / "lines.txt"
    # sparse headers so whole splits contain no non-null value
    lines = []
    for i in range(4000):
        if i in (37, 2111):
            lines.append(f"H{i}")
        else:
            lines.append(f"d{i}")
    p.write_text("\n".join(lines) + "\n")

    def parsed(det: bool):
        lines_df = (
            spark.read.option(
                "lineSep", "\n"
            ).text(str(p))
        )
        tagged = lines_df.withColumn(
            "ord", F.monotonically_increasing_id()
        ).withColumn(
            "v",
            F.when(
                F.col("value").startswith("H"),
                F.regexp_extract("value", r"^H(\d+)", 1).try_cast("int"),
            ),
        )
        return forward_fill_global(
            tagged, "ord", "v", "filled", deterministic_source=det
        ).select("value", "ord", "filled")

    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        # key by the line text: monotonically_increasing_id is NOT
        # contiguous across partitions, only monotonic
        fast = {r["value"]: r["filled"] for r in parsed(True).collect()}
        slow = {r["value"]: r["filled"] for r in parsed(False).collect()}
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert fast == slow
    assert fast["d0"] is None and fast["d36"] is None  # leading run NULL
    assert fast["H37"] == 37 and fast["d2110"] == 37
    assert fast["d3999"] == 2111


def test_deterministic_path_rejects_shuffled_input(spark):
    """deterministic_source=True must fail loudly on a shuffled frame
    (ADVICE r9): the fast path's two traversals could otherwise see
    different partition contents and silently fill wrong."""
    import pytest

    df = (
        spark.range(100)
        .withColumn("v", F.when(F.col("id") % 10 == 0, F.col("id")))
        .repartition(8)  # round-robin shuffle: nondeterministic layout
    )
    with pytest.raises(ValueError, match="shuffle-free"):
        forward_fill_global(df, "id", "v", "filled", deterministic_source=True)


def test_deterministic_path_accepts_narrow_scan(spark, tmp_path):
    """The guard must NOT trip on the contract's intended input — a
    narrow frame over a file scan (no shuffle Exchange in the plan)."""
    p = tmp_path / "narrow.txt"
    p.write_text("".join(f"{i}\n" for i in range(50)))
    df = (
        spark.read.text(str(p))
        .withColumn("ord", F.monotonically_increasing_id())
        .withColumn("v", F.col("value").try_cast("int"))
        .withColumn("v", F.when(F.col("v") % 5 == 0, F.col("v")))
    )
    out = forward_fill_global(df, "ord", "v", "filled",
                              deterministic_source=True)
    rows = {r["value"]: r["filled"] for r in out.collect()}
    assert rows["4"] == 0 and rows["49"] == 45

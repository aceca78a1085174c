"""Sink retry/backoff, CHECK-validate NULL accounting, JDBC read-back."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netflix_data_ingestion_spark import schemas
from netflix_data_ingestion_spark.sources.readers import read_jdbc
from netflix_data_ingestion_spark.sources.writers import (
    with_retry,
    write_partitioned,
)


def test_with_retry_succeeds_after_transient_failures():
    calls, sleeps = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert (
        with_retry(flaky, attempts=3, backoff_seconds=10, sleep=sleeps.append)
        == "ok"
    )
    assert len(calls) == 3
    assert sleeps == [10.0, 20.0]  # linear backoff, reference 10/20/30s shape


def test_with_retry_exhausts_and_reraises():
    calls, sleeps = [], []

    def always_fails():
        calls.append(1)
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        with_retry(
            always_fails, attempts=3, backoff_seconds=1, sleep=sleeps.append
        )
    assert len(calls) == 3
    assert sleeps == [1.0, 2.0]


def test_write_partitioned_retries_injected_sink_failure(
    spark, tmp_path, monkeypatch
):
    from pyspark.sql.readwriter import DataFrameWriter

    calls = []
    orig = DataFrameWriter.parquet

    def flaky(self, path, **kw):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("injected transient sink failure")
        return orig(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", flaky)
    df = spark.range(10)
    write_partitioned(df, str(tmp_path / "t"), backoff_seconds=0)
    assert len(calls) == 2
    assert spark.read.parquet(str(tmp_path / "t")).count() == 10


def test_validate_routes_null_predicate_rows_to_invalid(spark):
    """NULL rating evaluates the CHECK to NULL; both filter(pred) and
    filter(~pred) would drop it — it must be COUNTED as invalid so
    valid + invalid == input (exact drop accounting)."""
    df = spark.createDataFrame([(1,), (7,), (None,)], "rating int")
    valid, invalid = schemas.validate(df, "fact_ratings")
    assert valid.count() == 1
    assert invalid.count() == 2  # out-of-range 7 AND the NULL
    assert valid.count() + invalid.count() == df.count()


def test_check_report_per_rule_counts_one_pass(spark):
    """check_report gives per-rule violation counts (NULL counts as a
    violation, matching validate's 3VL posture) from ONE aggregation
    pass, and reconciles with validate: a row is invalid iff it
    violates at least one rule."""
    df = spark.createDataFrame(
        [
            (1, 1, 1, 0),      # clean
            (13, 1, 1, 0),     # month out of range
            (2, 40, 1, 0),     # day out of range
            (3, 2, 9, -1),     # quarter AND dow out of range
            (None, 2, 2, 2),   # NULL month -> month_range violation
        ],
        "month int, day int, quarter int, day_of_week int",
    )
    rep = {
        r["rule"]: (r["violations"], r["rows_scanned"])
        for r in schemas.check_report(df, "dim_date").collect()
    }
    assert rep == {
        "month_range": (2, 5),
        "day_range": (1, 5),
        "quarter_range": (1, 5),
        "day_of_week_range": (1, 5),
    }
    valid, invalid = schemas.validate(df, "dim_date")
    assert valid.count() == 1 and invalid.count() == 4

    with pytest.raises(ValueError, match="no CHECK rules"):
        schemas.check_report(df, "no_such_table")

    # empty frame: zero violations per rule, zero rows scanned
    rep0 = {
        r["rule"]: (r["violations"], r["rows_scanned"])
        for r in schemas.check_report(df.limit(0), "dim_date").collect()
    }
    assert all(v == (0, 0) for v in rep0.values()) and len(rep0) == 4


def test_read_jdbc_partition_bounds_required(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:derby:memory:x", "t", partition_column="id")


def test_read_jdbc_roundtrip_if_driver_available(spark, tmp_path):
    """Round-trip through a real JDBC database when a driver exists on
    the classpath; skipped in driverless environments (this container
    ships no JDBC jars — parquet is the primary storage)."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    try:
        spark.range(5).write.jdbc(url, "t", mode="overwrite")
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"no JDBC driver available: {type(exc).__name__}")
    out = read_jdbc(spark, url, "t")
    assert out.count() == 5


def test_write_balanced_even_shards(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.sources.writers import write_balanced

    # heavily skewed input partitioning: one fat partition + crumbs
    df = (
        spark.range(0, 5000)
        .withColumn("payload", F.md5(F.col("id").cast("string")))
        .repartitionByRange(10, F.col("id"))
    )
    path = str(tmp_path / "balanced")
    shards = write_balanced(df, path, "id", target_rows_per_file=1000)
    assert shards == 5
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 5
    counts = [
        spark.read.parquet(f).count() for f in files
    ]
    # md5-range spread: every shard within 20% of the target
    assert all(800 <= c <= 1200 for c in counts), counts
    # nothing lost, nothing duplicated
    assert spark.read.parquet(path).count() == 5000
    assert spark.read.parquet(path).select("id").distinct().count() == 5000


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from netflix_data_ingestion_spark.sources.writers import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(50).write.parquet(path)
    import glob

    before = len(glob.glob(path + "/part-*.parquet"))
    assert before == 50
    shards = compact_parquet(spark, path, target_rows_per_file=500)
    after = len(glob.glob(path + "/part-*.parquet"))
    assert shards == 2 and after == 2
    got = spark.read.parquet(path).orderBy("id").collect()
    assert len(got) == 1000 and got[7]["v"] == 14
    # temp dir cleaned up by the swap
    assert not glob.glob(path + ".compact.tmp")


def test_manifest_pruning_skips_files_and_matches_full_scan(spark, tmp_path):
    from netflix_data_ingestion_spark.sources.writers import (
        compact_parquet,
        pruned_read,
        write_manifest,
    )

    path = str(tmp_path / "clustered")
    df = spark.range(2000).withColumn("v", F.col("id") % 7)
    df.repartition(40).write.parquet(path)
    # compact CLUSTERED on id, then manifest
    compact_parquet(spark, path, target_rows_per_file=250, order_col="id")
    write_manifest(spark, path, ["id"])
    got, selected, total = pruned_read(spark, path, "id", 100, 180)
    assert total == 8
    # a narrow range on a range-clustered layout touches few files
    assert 1 <= selected <= 2
    expect = spark.read.parquet(path).filter(F.col("id").between(100, 180))
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in expect.collect()
    )
    # empty range: zero files, empty frame with the right schema
    got0, sel0, _ = pruned_read(spark, path, "id", 99999, 100000)
    assert sel0 == 0 and got0.count() == 0 and got0.columns == ["id", "v"]


def test_length_sorted_shards(spark, tmp_path):
    """Each output file is internally length-sorted (padding-efficient
    batching), rows survive exactly, and shards stay balanced."""
    import glob

    from netflix_data_ingestion_spark.sources.writers import (
        write_length_sorted_shards,
    )

    rows = [(i, "x" * ((i * 37) % 500 + 1)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("n_chars", __import__("pyspark").sql.functions.length("text"))
    path = str(tmp_path / "sorted_shards")
    shards = write_length_sorted_shards(
        df, path, "doc_id", "n_chars", target_rows_per_file=500
    )
    assert shards == 4
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    total = 0
    import pyarrow.parquet as pq

    for f in files:
        lens = pq.read_table(f, columns=["n_chars"])["n_chars"].to_pylist()
        assert lens == sorted(lens), f
        total += len(lens)
    assert total == 2000

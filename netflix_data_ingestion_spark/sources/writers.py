"""Sinks (SURVEY.md §2.1 K1-K3 replacements).

The reference's write path is JDBC appends for dimensions
(etl_pipeline_spark.py:829-834, 914-919) and a driver-funneled
toPandas->CSV->COPY for the fact table (:1181-1330).  Here the primary
sink is distributed Parquet — partitioned for pruning, optionally
bucketed for co-located joins — with JDBC kept as an optional parity
sink (executor-side ``df.write.jdbc``, no driver funnel).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

_T = TypeVar("_T")


def with_retry(
    action: Callable[[], _T],
    attempts: int = 3,
    backoff_seconds: float = 10.0,
    sleep: Callable[[float], None] = time.sleep,
) -> _T:
    """Run a sink action with linear-backoff retries (reference parity:
    the bulk load retries 3x with 10/20/30s waits,
    etl_pipeline_spark.py:1254-1310).

    Transient sink failures (connection reset, lease timeout, throttled
    object store) shouldn't abort an hours-long pipeline stage; attempt
    *n* waits ``backoff_seconds * n`` before retrying.  The last failure
    re-raises.  ``sleep`` is injectable for tests.
    """
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    for attempt in range(1, attempts + 1):
        try:
            return action()
        except Exception as exc:  # noqa: BLE001 — sink errors are opaque
            if attempt == attempts:
                raise
            wait = backoff_seconds * attempt
            logger.warning(
                "sink attempt %d/%d failed (%s); retrying in %.0fs",
                attempt,
                attempts,
                exc,
                wait,
            )
            sleep(wait)
    raise AssertionError("unreachable")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    attempts: int = 3,
    backoff_seconds: float = 10.0,
) -> None:
    """Partitioned Parquet write — date-derived partition columns give
    partition pruning on time-ranged queries (the reference's roadmap
    wish, README.md:819).  Retries transient failures (`with_retry`)."""

    def _write() -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    with_retry(_write, attempts=attempts, backoff_seconds=backoff_seconds)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket columns
    between co-bucketed tables need NO shuffle — the scale play for a
    fact table repeatedly joined on the same key."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    max_connections: int = 20,
    attempts: int = 3,
    backoff_seconds: float = 10.0,
) -> None:
    """Executor-side JDBC sink (parity with reference K1/K2): coalesce
    bounds concurrent connections like the reference's coalesce(20)
    (etl_pipeline_spark.py:1028).  Retries transient failures
    (`with_retry`, reference etl_pipeline_spark.py:1254-1310 parity);
    use mode='append' only with idempotent/staging targets since a
    mid-write failure can leave partial rows before the retry."""
    with_retry(
        lambda: df.coalesce(max_connections).write.jdbc(
            url, table, mode=mode, properties=properties or {}
        ),
        attempts=attempts,
        backoff_seconds=backoff_seconds,
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog)."""
    return spark.table(table)


def write_balanced(
    df: DataFrame,
    path: str,
    id_col: str,
    target_rows_per_file: int,
    salt: str = "v1",
) -> int:
    """Write parquet in evenly-sized shards regardless of upstream skew.

    Training-data loaders stream shards round-robin: one 10 GB shard
    among 100 MB ones stalls a whole data-parallel epoch.  Partition
    pruning / clustering does not matter for this consumer (it reads
    everything), so rows are spread by the md5 of the id — uniform by
    construction, deterministic across runs — into
    ``ceil(n / target_rows_per_file)`` shards via repartitionByRange on
    the hash (range, not hash-mod, so shard count is exact and shards
    are contiguous hash slices).

    One count (to size the layout) + one shuffle (the spread).  Returns
    the shard count.
    """
    import math

    n = df.count()
    shards = max(1, math.ceil(n / target_rows_per_file))
    keyed = df.withColumn(
        "__shard_key",
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
    )
    (
        keyed.repartitionByRange(shards, F.col("__shard_key"))
        .drop("__shard_key")
        .write.mode("overwrite")
        .parquet(path)
    )
    return shards


def write_length_sorted_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    length_col: str,
    target_rows_per_file: int,
    salt: str = "v1",
) -> int:
    """``write_balanced`` + WITHIN-shard length sort — the
    padding-minimizing layout for sequence-model training: a loader
    batching consecutive rows gets near-uniform lengths per batch
    (short docs don't pad up to the one long straggler), while the
    md5-range spread still keeps shard SIZES even and the global order
    decorrelated from content.  ``sortWithinPartitions`` adds no
    shuffle — the sort rides the shards the balance repartition
    already built.  Returns the shard count.
    """
    import math

    n = df.count()
    shards = max(1, math.ceil(n / target_rows_per_file))
    keyed = df.withColumn(
        "__shard_key",
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
    )
    (
        keyed.repartitionByRange(shards, F.col("__shard_key"))
        .sortWithinPartitions(F.col(length_col).asc(), F.col(id_col).asc())
        .drop("__shard_key")
        .write.mode("overwrite")
        .parquet(path)
    )
    return shards


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    order_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into ``ceil(n / target)`` right-sized
    files — the small-file compaction every long-running ingest needs
    (streaming sinks and fine-grained partition writes accrete KB-sized
    files; at 100 TB the NameNode/listing cost and per-file open
    latency of millions of tiny files dominates scan time long before
    the bytes do).

    With ``order_col`` the rewrite uses ``repartitionByRange`` so files
    stay CLUSTERED on that column and per-file min/max stats (parquet
    footers and `write_manifest`) keep pruning power; without it a
    plain repartition spreads rows evenly.  The swap is
    write-to-temp + directory rename — the local-FS stand-in for the
    manifest-pointer flip a table format does on an object store.
    Returns the new file count.
    """
    import math
    import os
    import shutil

    src = spark.read.parquet(path)
    n = src.count()
    shards = max(1, math.ceil(n / target_rows_per_file))
    out = (
        src.repartitionByRange(shards, F.col(order_col))
        if order_col
        else src.repartition(shards)
    )
    tmp = path.rstrip("/") + ".compact.tmp"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return shards


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "_manifest"


def write_manifest(
    spark: SparkSession, path: str, key_cols: list[str]
) -> str:
    """Write a per-file min/max/row-count manifest for a parquet
    directory — engine-level data skipping (the zone-map / table-format
    pattern: prune FILES from the listing before any scan task runs,
    which parquet row-group stats alone cannot do — they are consulted
    only after a task has opened the file).

    One aggregation pass grouped by ``input_file_name()``; output is
    file-count-sized.  Pairs with `operators/zorder.zorder_layout` /
    `compact_parquet(order_col=...)`: clustered layout makes per-file
    ranges narrow, which is what gives min/max pruning its bite.
    Returns the manifest path (``<path>_manifest``).
    """
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    man = (
        df.groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )
    mpath = _manifest_path(path)
    man.coalesce(1).write.mode("overwrite").parquet(mpath)
    return mpath


def pruned_read(
    spark: SparkSession,
    path: str,
    key_col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Range-read ``[lo, hi]`` on ``key_col`` touching only the files
    whose manifest min/max overlaps the range.  Returns
    (dataframe, files_selected, files_total).

    The manifest is a may-contain index, so the exact residual filter
    is re-applied to the selected files — correctness never depends on
    manifest freshness for FALSE positives (a stale manifest can only
    over-select; after `compact_parquet` re-run `write_manifest`).
    The manifest collect is file-list-sized (driver-safe).
    """
    man = spark.read.parquet(_manifest_path(path))
    rows = man.select(
        "file", f"min_{key_col}", f"max_{key_col}"
    ).collect()
    files = [
        r["file"]
        for r in rows
        if r[f"max_{key_col}"] >= lo and r[f"min_{key_col}"] <= hi
    ]
    residual = F.col(key_col).between(lo, hi)
    if not files:
        return (
            spark.read.parquet(path).filter(F.lit(False)),
            0,
            len(rows),
        )
    return (
        spark.read.parquet(*files).filter(residual),
        len(files),
        len(rows),
    )


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink with the same retry + partitioning discipline as the
    parquet writers (``with_retry``; directory-partitioned layout for
    pruning).  ZLIB is ORC's portable default codec — left as-is so
    files interop with stock Hive/Trino readers."""
    def _write() -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)

    with_retry(_write)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink (one JSON object per row) — the lingua franca of
    training-data interchange; gzip per-part by default (JSONL's size
    penalty vs parquet is the price of universal readability — use it
    at the EDGE of the pipeline, parquet inside).  Same retry
    discipline as every writer here; round-trips through
    ``readers.read_jsonl`` schema-for-schema."""
    def _write() -> None:
        w = df.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        w.json(path)

    with_retry(_write)

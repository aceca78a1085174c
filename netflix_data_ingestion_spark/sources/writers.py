"""Sinks (SURVEY.md §2.1 K1-K3 replacements).

The reference's write path is JDBC appends for dimensions
(etl_pipeline_spark.py:829-834, 914-919) and a driver-funneled
toPandas->CSV->COPY for the fact table (:1181-1330).  Here the primary
sink is distributed Parquet — partitioned for pruning, optionally
bucketed for co-located joins — with JDBC kept as an optional parity
sink (executor-side ``df.write.jdbc``, no driver funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned Parquet write — date-derived partition columns give
    partition pruning on time-ranged queries (the reference's roadmap
    wish, README.md:819)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


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
) -> None:
    """Executor-side JDBC sink (parity with reference K1/K2): coalesce
    bounds concurrent connections like the reference's coalesce(20)
    (etl_pipeline_spark.py:1028)."""
    df.coalesce(max_connections).write.jdbc(
        url, table, mode=mode, properties=properties or {}
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog)."""
    return spark.table(table)

"""Source readers (SURVEY.md §2.1 S1/S5).

- Line-text scan (S1): ``spark.read.text`` — used by the Netflix-format
  parsers; one ``value: string`` row per line.
- Parquet table scan (S5 replacement): the engine's storage format.  The
  reference read its own tables back over JDBC
  (etl_pipeline_spark.py:1375-1385); here tables are partitioned Parquet,
  so scans get predicate pushdown + partition pruning from Catalyst.
- Testdata loader: registers the driver-generated TPC-H-ish tables
  (TESTDATA.md) as both DataFrames and temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_lines(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Line-text scan (reference etl_pipeline_spark.py:890, 973, 1094)."""
    return spark.read.text(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC read-back source (reference etl_pipeline_spark.py:1375-1385
    parity — it re-reads its own tables over JDBC for post-processing).

    Without `partition_column` the whole table arrives through ONE
    connection in ONE task — fine for dimension reads, wrong for facts;
    pass a numeric column + bounds to split the scan into
    `num_partitions` parallel range queries (the standard Spark JDBC
    parallelism contract).  Parquet is this engine's primary storage —
    this source exists for interop with an existing warehouse.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read one engine/testdata table stored as Parquet.

    Handles TIMESTAMP(NANOS) parquet columns (which Spark's vectorized
    reader rejects): reads them as raw int64 nanos via the legacy conf and
    converts to microsecond timestamps JVM-side.  Sub-microsecond
    precision is truncated — acceptable for event-time analytics.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(root, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # - integer DIV: float division of ns epochs exceeds double's
        #   53-bit mantissa and lands 1us off
        # - TIMESTAMP_NTZ construction: the parquet type is
        #   isAdjustedToUTC=false (wall clock); timestamp_micros() would
        #   re-render it through the session timezone
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated tables and register temp views."""
    out: dict[str, DataFrame] = {}
    for t in tables:
        df = read_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    bad_records_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan with an EXPLICIT schema and PERMISSIVE corrupt-record
    capture.

    Policy choices, all deliberate for a 100 TB ingest:
      * schema is required — ``inferSchema`` runs a second full scan of
        the data and can flip types between daily drops; a declared
        schema is the only stable contract (same reasoning as
        schemas.py's DDL parity).
      * PERMISSIVE + ``columnNameOfCorruptRecord``: malformed lines land
        whole in ``bad_records_col`` instead of killing the job
        (FAILFAST) or vanishing (DROPMALFORMED) — the caller routes them
        to a dead-letter sink and ACCOUNTS for them, the same
        drop-accounting discipline as the ratings parser.
    """
    return (
        spark.read.schema(f"{schema}, {bad_records_col} string")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", bad_records_col)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: str,
    bad_records_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with explicit schema + corrupt-record capture
    (same policy rationale as ``read_csv``).  Fields present in the
    data but absent from the schema are ignored; absent fields read as
    NULL — additive schema evolution without job changes."""
    return (
        spark.read.schema(f"{schema}, {bad_records_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", bad_records_col)
        .json(path)
    )


def split_dead_letters(
    df: DataFrame, bad_records_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, dead_letters) — clean rows lose the corrupt column;
    dead letters keep the raw line for quarantine + replay.

    The parsed frame is localCheckpoint'ed (lazily): Spark refuses plans
    that reference ONLY the corrupt-record column of a raw CSV/JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    halves are about to be acted on anyway, so one shared
    materialization is the documented-and-cheapest fix.  A GC-scoped
    checkpoint, not ``cache()`` — this package's storage-purity rule
    (test_star_pipeline.test_no_lingering_persistent_rdds): blocks
    drain when the frames are dropped, nothing pins the CacheManager
    for the session lifetime.
    """
    df = df.localCheckpoint(eager=False)
    clean = df.where(F.col(bad_records_col).isNull()).drop(bad_records_col)
    dead = df.where(F.col(bad_records_col).isNotNull())
    return clean, dead


def read_orc(
    spark: SparkSession, path: str | list[str], schema: str | None = None
) -> DataFrame:
    """ORC scan — the columnar-interop sibling of the parquet path for
    lakes standardized on ORC (Hive-lineage warehouses).  Predicate
    pushdown and column pruning work exactly as for parquet (asserted
    in test_formats); pass ``schema`` to pin the read contract, or omit
    it to take the file footer's (ORC embeds its schema, so unlike CSV
    there is no inference scan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


_MEDIA_EXT = {
    "ppm": "image", "pgm": "image", "bmp": "image", "png": "image",
    "jpg": "image", "jpeg": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_dir(
    spark: SparkSession, path: str, glob: str = "*"
) -> DataFrame:
    """Directory of media files -> a MEDIA_SCHEMA frame (media_id,
    payload, media_type, n_bytes, sha256) via Spark's built-in
    ``binaryFile`` source — the real ingest edge of the multimodal
    pipeline (operators/multimodal): files land as one binary column
    plus typed metadata, ready for decode_real_features / resize_real /
    phash_real.

    media_id is the 63-bit xxhash64 of the file path (content-stable
    across re-listings; collision odds are the birthday bound, ~1e-9 at
    1e5 files); media_type maps from the extension, 'other' when
    unknown.  At 100 TB: binaryFile splits by FILE (payloads are never
    split), so set spark.sql.files.maxPartitionBytes with payload sizes
    in mind and compact tiny files first — the listing, not the bytes,
    is the first bottleneck (sources/writers.write_manifest pattern).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    type_expr = F.lit("other")
    for e, t in _MEDIA_EXT.items():
        type_expr = F.when(ext == e, t).otherwise(type_expr)
    return raw.select(
        F.abs(F.xxhash64(F.col("path"))).alias("media_id"),
        F.col("content").alias("payload"),
        type_expr.alias("media_type"),
        F.col("length").cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )

"""Structured Streaming ingestion surface — beyond-reference.

The reference lists Kafka/real-time ingestion as an unimplemented roadmap
item (README.md:823) and is batch full-reload only (README.md:829-832).
This module provides the streaming ingestion surface the north star asks
for (BASELINE.json: "Structured Streaming or batch DataFrame ingestion"):

- file-source ``readStream`` over events-shaped data (swap in Kafka with
  ``.format("kafka")`` — the transformations are source-agnostic),
- watermarked tumbling / sliding event-time windows for late data,
- streaming dedup keyed on event id within the watermark,
- session windows (built-in ``session_window``) as the stateful op.

Every transformation here is also valid on a batch DataFrame — the
batch twin ``events_tumbling_window`` in plans/contract_llm.py is
oracle-checked, which pins the semantics the streaming path inherits.

Scale posture: watermark bounds state; windows aggregate with map-side
partial combine; dedup state is (key -> max event-time) per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession, source_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source event stream (one file per micro-batch discovery)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("path", source_dir)
        .load()
    )


MEDIA_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def stream_media(
    spark: SparkSession, source_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream of opaque binary media payloads — the
    streaming twin of the batch MEDIA_SCHEMA ingest.  The real codec
    stages (multimodal.decode_real_features / gif_frame_stats /
    avi_frame_stats, audio.decode_audio_features, audio.resample_audio)
    are all STATELESS Arrow ``mapInPandas``, so they apply to this
    stream unchanged — proven stream==batch by test
    (tests/test_streaming.py::test_streaming_media_decode_matches_batch).
    At scale the same plan reads from Kafka with payloads in the value
    column; only this source function changes."""
    return (
        spark.readStream.format(fmt)
        .schema(MEDIA_STREAM_SCHEMA)
        .option("path", source_dir)
        .load()
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate (streaming or batch frame)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_count",
            "avg_value",
            "approx_users",
        )
    )


def sliding_type_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window per-type counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    The streaming analog of the reference's union+distinct customer dedup
    (etl_pipeline_spark.py:988-994): state is bounded by the watermark.

    Keyed on event_id ALONE (`dropDuplicatesWithinWatermark`): a replayed
    event_id whose ts drifted (late re-delivery, producer retry with a
    fresh timestamp) is still a duplicate and is dropped — unlike
    ``dropDuplicates([id, ts])``, which only drops byte-identical
    replays.  State per key expires once the watermark passes the FIRST
    arrival's event time plus the delay, so memory stays bounded.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (stateful op via built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("events_in_session"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "events_in_session",
            "session_value",
        )
    )


def join_clicks_to_errors(
    events: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: each 'error' event paired with the same
    user's 'click' events in the preceding `lookback` window — the
    streaming form of the batch error-context range join
    (`error_context_range_join`, oracle-checked).

    Both sides carry event-time watermarks and the join condition bounds
    the event-time distance, which is exactly what lets Spark EXPIRE
    buffered join state: a click older than (watermark + lookback) can
    never match a future error, so its state is dropped.  Without the
    time bound the state store would grow forever — the difference
    between a demo and a 100 TB/day stream.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    return clicks.join(
        errors,
        F.expr(
            f"c_user = e_user AND "
            f"c_ts BETWEEN e_ts - INTERVAL {lookback} AND e_ts"
        ),
    ).select("error_id", "e_user", "e_ts", "click_id", "c_ts")


def sized_stream_shuffle_partitions(
    spark,
    src_bytes: int,
    target_bytes: int = 64 << 20,
    expansion: int = 4,
) -> int:
    """Shuffle/state partition count for a STATEFUL streaming query,
    derived from the input volume instead of the core count (guide
    §2.2 — partitioning should be scale-adaptive, not a constant tuned
    for either local mode or the cluster).

    Rationale: a streaming aggregation/join pays a fixed state-store
    open+commit cost PER PARTITION PER MICRO-BATCH, and — unlike a
    batch shuffle — AQE cannot coalesce it (the state partition count
    is pinned at first run by the checkpoint).  Measured at sf0.1
    (events ≈ 12 MB decoded): the stream-stream join ran 8.8-11.7 s at
    32 state partitions and 2.1-3.4 s at 1-8 — the state machinery,
    not the data, owned the wall clock.  Sizing by decoded input bytes
    at the batch-AQE advisory target (64 MB/partition) gives small
    jobs the small state-store count they want, while at cluster scale
    the same formula saturates the cap (3x the session parallelism —
    the usual 2-3x rule of thumb) long before state stores are
    starved: 100 TB/day / 64 MB >> any cluster's core count.

    ``expansion`` approximates the parquet->row decode ratio of the
    narrow event/CDC schemas here (~4x measured); only its order of
    magnitude matters, since the result is clamped at both ends.
    """
    cap = 3 * spark.sparkContext.defaultParallelism
    return max(1, min(cap, -(-src_bytes * expansion // target_bytes)))


def path_bytes(path: str) -> int:
    """Total on-disk bytes of a file or (one level of) a directory."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
    return os.path.getsize(path)


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    max_data_batches: int | None = None,
    shuffle_partitions: int | None = None,
) -> None:
    """Drain a stream into an in-memory table with availableNow (for tests
    and batch-over-stream replays); blocks until all available data is
    processed.

    ``max_data_batches`` enforces a load-bearing batching assumption:
    some closed-window oracles are only valid when availableNow yields a
    single DATA micro-batch (a multi-file source plus any
    maxFilesPerTrigger setting, or a Spark default change, would let
    between-batch watermark advancement late-drop rows).  Pass 1 to turn
    that documented assumption into a hard failure instead of a silent
    wrong answer — the count comes from the query's own progress
    records (data batch = numInputRows > 0; the trailing no-data flush
    batch doesn't count).

    ``shuffle_partitions`` (usually from
    :func:`sized_stream_shuffle_partitions`) pins the stateful
    shuffle/state-store partition count for THIS query only: the conf
    is set before start() — the moment the count is frozen into the
    query's checkpoint — and restored after the availableNow drain, so
    the session default and every batch query are untouched.  Results
    are partition-count invariant (keyed state per key; the memory
    sink is re-sorted by every caller)."""
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key, None) if shuffle_partitions is not None else None
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
    if max_data_batches is not None:
        assert_data_batches(q, query_name, max_data_batches)


def assert_data_batches(q, name: str, max_data_batches: int) -> None:
    """Raise if a finished streaming query ran more DATA micro-batches
    than the caller's oracle tolerates (data batch = numInputRows > 0;
    trailing no-data flush batches don't count).  Shared by
    run_to_memory and the foreachBatch-sink contract rows."""
    data_batches = sum(
        1 for p in q.recentProgress if int(p.numInputRows) > 0
    )
    if data_batches > max_data_batches:
        raise RuntimeError(
            f"stream {name!r} ran {data_batches} data "
            f"micro-batches (max {max_data_batches}): the "
            "closed-window oracle's single-batch assumption is "
            "violated — check maxFilesPerTrigger / source layout"
        )


STREAK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("streak", T.LongType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

STREAK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("streak_len", T.LongType(), True),
        T.StructField("ended_at", T.TimestampType(), True),
    ]
)


def error_streaks(
    events: DataFrame,
    min_streak: int = 2,
    watermark: str = "2 hours",
    timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per user,
    track consecutive 'error' events; emit (user_id, streak_len,
    ended_at) whenever a non-error event breaks a streak of at least
    `min_streak`, or the state times out (processing-time) mid-streak.

    This is the escape hatch for stateful logic the built-in windowed
    aggregates can't express (the streak length depends on event
    ORDER, not on a time bucket).  State is one (streak, last_ts) pair
    per user — bounded, partitioned by key, and expired by timeout, the
    discipline any 100 TB streaming state needs.  Batch twin for tests:
    `error_streaks_batch`.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            streak, last_ts = state.get
            state.remove()
            if streak is not None and streak >= min_streak:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "streak_len": [streak],
                        "ended_at": [last_ts],
                    }
                )
            return
        streak, last_ts = state.get if state.exists else (0, None)
        out_rows: list[tuple[int, int, object]] = []
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if etype == "error":
                streak += 1
                last_ts = ts
            else:
                if streak >= min_streak:
                    out_rows.append((user_id, streak, last_ts))
                streak, last_ts = 0, None
        state.update((streak, last_ts))
        state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "streak_len", "ended_at"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=STREAK_OUTPUT_SCHEMA,
            stateStructType=STREAK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="ProcessingTimeTimeout",
        )
    )


def error_streaks_batch(events: DataFrame, min_streak: int = 2) -> DataFrame:
    """Batch twin of `error_streaks` (completed streaks only): pure
    DataFrame gaps-and-islands — group consecutive errors via the
    row_number-difference trick, keep groups broken by a later event."""
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id").orderBy("ts")
    typed = events.select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    numbered = typed.withColumn("rn", F.row_number().over(w_user)).withColumn(
        "grp", F.col("rn") - F.sum("is_err").over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    streaks = (
        numbered.filter(F.col("is_err") == 1)
        .groupBy("user_id", "grp")
        .agg(
            F.count("*").alias("streak_len"),
            F.max("ts").alias("ended_at"),
            F.max("rn").alias("max_rn"),
        )
    )
    # a streak is 'completed' iff some row follows it for that user
    last_rn = typed.withColumn("rn", F.row_number().over(w_user)).groupBy(
        "user_id"
    ).agg(F.max("rn").alias("last_rn"))
    return (
        streaks.join(last_rn, "user_id")
        .filter(
            (F.col("streak_len") >= min_streak)
            & (F.col("max_rn") < F.col("last_rn"))
        )
        .select("user_id", "streak_len", "ended_at")
    )


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich a (possibly streaming) event frame with
    a static dimension.  Catalyst broadcasts the static side per
    micro-batch, so the stream never shuffles — the standard pattern for
    attaching slowly-changing reference data to a 100 TB/day stream
    (refresh the dim by restarting the query or reading a versioned
    table)."""
    return events.join(F.broadcast(dim), key, "left")


def write_idempotent_parquet(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch sink writing each micro-batch to parquet exactly once:
    the batch id keys an overwrite-by-partition, so replayed batches
    (failure recovery) land in the same partition instead of duplicating
    — idempotence without a transactional table format."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def apply_cdc_stream(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_cols: list[str],
    tombstone_col: str | None = None,
    order_col: str = "ts",
):
    """Streaming CDC apply: fold each micro-batch of change rows into a
    parquet snapshot via operators/merge.merge_upsert (update / insert /
    tombstone-delete), writing the merged state back atomically
    (write-new-then-swap via two alternating subdirs, since parquet
    cannot overwrite a directory it is reading).

    A replayed micro-batch (failure recovery) re-merges the same
    changes — upsert is idempotent per key, so the snapshot converges
    to the same state: exactly-once EFFECT without a transactional
    table format.  Within one batch, multiple changes to the same key
    collapse to the latest by ``order_col`` (default ``"ts"``; the
    changes stream MUST carry this column) before merging (MERGE
    requires a key-unique source).

    At 100 TB the snapshot side would be a bucketed table (see
    merge_upsert's plan note) and the swap a metastore pointer flip —
    the directory alternation here is the format-free local equivalent.
    """
    import os

    from netflix_data_ingestion_spark.operators.merge import merge_upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cols = key_cols + value_cols
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*cols, *( [tombstone_col] if tombstone_col else [] ))
        )
        cur_marker = os.path.join(snapshot_dir, "CURRENT")
        if os.path.exists(cur_marker):
            with open(cur_marker) as fh:
                cur = fh.read().strip()
            target = spark.read.parquet(os.path.join(snapshot_dir, cur))
        else:
            cur = "b"
            target = spark.createDataFrame([], latest.select(*cols).schema)
        merged = merge_upsert(
            target, latest, key_cols, tombstone_col=tombstone_col
        )
        nxt = "a" if cur == "b" else "b"
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, nxt)
        )
        with open(cur_marker, "w") as fh:
            fh.write(nxt)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def read_cdc_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Current state written by apply_cdc_stream (marker-selected side)."""
    import os

    with open(os.path.join(snapshot_dir, "CURRENT")) as fh:
        cur = fh.read().strip()
    return spark.read.parquet(os.path.join(snapshot_dir, cur))


def maintain_cms_stream(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    item_col: str,
    width: int = 64,
    depth: int = 4,
):
    """Streaming frequency-sketch maintenance: each micro-batch is
    sketched (operators/sketch.cms_build — bounded depth x width state)
    and FOLDED into the snapshot sketch with the algebraic combine
    (operators/merge.merge_aggregates: counts add on (row, bucket)) —
    the composition the three operators were built for: a running
    "how often has item x ever occurred" service whose state size never
    grows with the stream.

    Same alternating-dir atomic swap as apply_cdc_stream; same caveat —
    a REPLAYED batch re-adds its counts (CMS estimates stay one-sided
    upper bounds, so the failure mode is a looser bound, never an
    undercount — acceptable for gating/heavy-hitter use; pair with an
    idempotent sink if exact replay semantics matter).

    Probe the snapshot with ``sketch.cms_estimate(read_cdc_snapshot(...))``.
    """
    import os

    from netflix_data_ingestion_spark.operators.merge import merge_aggregates
    from netflix_data_ingestion_spark.operators.sketch import cms_build

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = cms_build(batch_df, item_col, width, depth)
        cur_marker = os.path.join(snapshot_dir, "CURRENT")
        if os.path.exists(cur_marker):
            with open(cur_marker) as fh:
                cur = fh.read().strip()
            target = spark.read.parquet(os.path.join(snapshot_dir, cur))
            merged = merge_aggregates(
                target, delta, ["row", "bucket"], sum_cols=["cnt"]
            )
        else:
            cur = "b"
            merged = delta
        nxt = "a" if cur == "b" else "b"
        merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, nxt))
        with open(cur_marker, "w") as fh:
            fh.write(nxt)

    return (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def maintain_moments_stream(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
    scale: int = 100,
):
    """Streaming anomaly-baseline maintenance: each micro-batch's exact
    per-key moments (operators/outliers.moments_build — count / sum /
    sum-of-squares, all algebraic) fold into the snapshot with
    merge_aggregates, so the running baseline costs O(keys) state no
    matter how long the stream runs.  Screen any frame against the
    current baseline with ``outliers.zscore_flag(df,
    read_cdc_snapshot(spark, snapshot_dir), ...)`` — the exact integer
    inequality, same bit-for-bit flags as the batch twin
    (``zscore_outliers``) computed over the full history.

    Same alternating-dir atomic swap + replay caveat as
    maintain_cms_stream (a replayed batch double-counts its moments;
    the batch twin is the audit tool).
    """
    import os

    from netflix_data_ingestion_spark.operators.merge import merge_aggregates
    from netflix_data_ingestion_spark.operators.outliers import moments_build

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = moments_build(batch_df, key_cols, value_col, scale)
        cur_marker = os.path.join(snapshot_dir, "CURRENT")
        if os.path.exists(cur_marker):
            with open(cur_marker) as fh:
                cur = fh.read().strip()
            target = spark.read.parquet(os.path.join(snapshot_dir, cur))
            merged = merge_aggregates(
                target, delta, key_cols, sum_cols=["__n", "__s", "__q"]
            )
        else:
            cur = "b"
            merged = delta
        nxt = "a" if cur == "b" else "b"
        merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, nxt))
        with open(cur_marker, "w") as fh:
            fh.write(nxt)

    return (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def maintain_hll_stream(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    item_col: str,
    buckets: int = 64,
):
    """Streaming distinct-count maintenance: each micro-batch's HLL
    registers (operators/sketch.hll_registers) MAX-fold into the
    snapshot — a running "how many distinct users ever" service in
    O(buckets) state.  Unlike the CMS/moments folds, MAX-merge is
    IDEMPOTENT, so a replayed batch cannot move the registers at all —
    this sketch is exactly-once under replay for free.

    Estimate with ``sketch.hll_estimate(read_cdc_snapshot(...).collect())``.
    """
    import os

    from netflix_data_ingestion_spark.operators.merge import merge_aggregates
    from netflix_data_ingestion_spark.operators.sketch import hll_registers

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = hll_registers(batch_df, item_col, buckets)
        cur_marker = os.path.join(snapshot_dir, "CURRENT")
        if os.path.exists(cur_marker):
            with open(cur_marker) as fh:
                cur = fh.read().strip()
            target = spark.read.parquet(os.path.join(snapshot_dir, cur))
            merged = merge_aggregates(
                target, delta, ["bucket"], max_cols=["register"]
            )
        else:
            cur = "b"
            merged = delta
        nxt = "a" if cur == "b" else "b"
        merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, nxt))
        with open(cur_marker, "w") as fh:
            fh.write(nxt)

    return (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


THROTTLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

THROTTLE_STATE_SCHEMA = T.StructType(
    [T.StructField("kept", T.IntegerType(), True)]
)

# state_scope="key" layout: per-key state is the map of active buckets ->
# kept counts, as two parallel arrays (bucket as epoch-nanos long — the
# state encoding is operator-internal, so the integer form skips
# timestamp boxing on every state round-trip)
THROTTLE_STATE_SCHEMA_KEY = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("kepts", T.ArrayType(T.LongType()), True),
    ]
)


def throttle_events(
    events: DataFrame,
    key_col: str = "user_id",
    bucket: str = "hour",
    limit: int = 10,
    watermark: str = "2 hours",
    timeout_ms: int = 2 * 60 * 60 * 1000,
    state_scope: str = "bucket",
) -> DataFrame:
    """Per-key RATE LIMIT: pass through at most ``limit`` events per
    (key, time bucket), drop the rest — the ingestion quota that stops
    one hot producer flooding a 100 TB pipeline (the streaming-time
    counterpart of sample.quota_sample's corpus-time domain cap).

    ``applyInPandasWithState`` keyed on (key, bucket): state is ONE int
    (events kept so far) per active (key, bucket) — bounded, expired by
    timeout after the bucket goes quiet.  Within a micro-batch events
    are admitted in (ts, event_id) order; ACROSS micro-batches
    admission is by arrival (an already-admitted event is never
    revoked), so under late data the streamed kept-set can differ from
    the batch twin's first-N-by-event-time — the inherent
    streaming/batch divergence, same as any online quota.  The batch
    twin ``throttle_events_batch`` (oracle-checked) pins the bucket
    math and the (ts, event_id) admission order.

    ``timeout_ms=0`` disables state expiry (``NoTimeout``) — required
    for finite batch-over-stream replays (``availableNow``): with a
    processing-time timeout registered, the no-more-data commit loop
    keeps running empty micro-batches until the timeout fires (hours),
    so the replay never terminates.  A 24/7 production stream keeps
    the default expiry; a bounded replay has no state to expire.

    ``state_scope`` picks the state-key granularity — an OPTIMIZATION
    knob, not a semantics one: the admitted set per (key, bucket) is
    identical under both scopes (each bucket still admits its first
    ``limit - kept`` rows in (ts, event_id) order, state is still
    never revoked).

    - ``"bucket"``: one state row per (key, bucket) — one Python group
      call per active bucket.  Finest-grained expiry (an idle bucket
      times out on its own).
    - ``"key"``: one state row per key holding the bucket->kept map —
      one Python group call PER KEY regardless of how many buckets the
      batch touches, with the per-bucket admission vectorized in numpy
      inside the call.  ``applyInPandasWithState`` pays a fixed
      serialization/pandas cost per GROUP CALL (measured ~5 ms/group:
      the sf0.1 day-bucket replay is 40,083 (user, day) groups = 206 s
      of single-core group overhead vs 1,500 user groups under "key"),
      so coarsening the state key is the §4-style fix: cross the
      Python boundary once per key, not once per (key, bucket).  At
      100 TB the same knob bounds state-row count and timer count by
      keys instead of keys x active buckets.  Trade-off: expiry is
      per key (the whole bucket map drops after the key goes quiet),
      which for a rate limiter is the usual intent anyway.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    expire = timeout_ms > 0
    out_cols = ["event_id", "ts", "user_id", "event_type", "value"]
    if state_scope not in ("bucket", "key"):
        raise ValueError("state_scope must be 'bucket' or 'key'")

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if expire and state.hasTimedOut:
            state.remove()
            return
        (kept,) = state.get if state.exists else (0,)
        chunks = list(pdfs)
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        room = limit - kept
        if len(rows) > room:
            # admission is (ts, event_id) order; when everything fits
            # the admitted SET needs no sort at all
            import numpy as np

            order = np.lexsort(
                (rows["event_id"].to_numpy(), rows["ts"].to_numpy())
            )
            out = rows.iloc[order[: max(0, room)]]
        else:
            out = rows
        state.update((min(limit, kept + len(rows)),))
        if expire:
            state.setTimeoutDuration(timeout_ms)
        if len(out):
            yield out[out_cols]

    def fn_key(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if expire and state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdfs)
        if not chunks:
            return
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        if len(rows) == 0:
            return
        if state.exists:
            b_prev, k_prev = state.get
            prev = dict(zip(b_prev or [], k_prev or []))
        else:
            prev = {}
        bk = rows["__bucket"].to_numpy().view("int64")
        order = np.lexsort(
            (rows["event_id"].to_numpy(), rows["ts"].to_numpy(), bk)
        )
        sb = bk[order]
        # rank within each bucket run of the (bucket, ts, event_id) sort
        newgrp = np.empty(len(sb), dtype=bool)
        newgrp[0] = True
        np.not_equal(sb[1:], sb[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        first = starts[np.cumsum(newgrp) - 1]
        rank = np.arange(len(sb)) - first
        if prev:
            kept_arr = np.fromiter(
                (prev.get(int(b), 0) for b in sb), dtype=np.int64, count=len(sb)
            )
            admit = rank < (limit - kept_arr)
        else:
            admit = rank < limit
        out = rows.iloc[order[admit]]
        ub = sb[starts]
        counts = np.diff(np.append(starts, len(sb)))
        for b, c in zip(ub.tolist(), counts.tolist()):
            prev[b] = min(limit, prev.get(b, 0) + c)
        state.update((list(prev.keys()), list(prev.values())))
        if expire:
            state.setTimeoutDuration(timeout_ms)
        if len(out):
            yield out[out_cols]

    bucketed = events.withWatermark("ts", watermark).withColumn(
        "__bucket", F.date_trunc(bucket, F.col("ts"))
    )
    if state_scope == "key":
        return bucketed.groupBy(key_col).applyInPandasWithState(
            fn_key,
            outputStructType=THROTTLE_OUTPUT_SCHEMA,
            stateStructType=THROTTLE_STATE_SCHEMA_KEY,
            outputMode="append",
            timeoutConf="ProcessingTimeTimeout" if expire else "NoTimeout",
        )
    return bucketed.groupBy(key_col, "__bucket").applyInPandasWithState(
        fn,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if expire else "NoTimeout",
    )


def throttle_events_batch(
    events: DataFrame,
    key_col: str = "user_id",
    bucket: str = "hour",
    limit: int = 10,
) -> DataFrame:
    """Batch twin of `throttle_events`: first ``limit`` events per
    (key, bucket) in (ts, event_id) order — one keyed window, rank,
    cut.  Oracle-checked (`events_throttled_hourly`)."""
    w = Window.partitionBy(
        key_col, F.date_trunc(bucket, F.col("ts"))
    ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def ohlc_stream(
    events: DataFrame,
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming OHLC bars: the watermarked twin of
    operators/resample.ohlc_resample — same combinable min_by/max_by
    aggregation, but bucketed with ``F.window`` so Structured Streaming
    can evict completed bars once the watermark passes (a date_trunc
    bucket has no event-time column the engine can reason about, so
    the batch form's bucket cannot expire state).  Emits one final bar
    per (key, window) in append mode; state is one partial bar per
    open window per key.
    """
    ord_struct = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .where(F.col("ts").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), F.col(key_col))
        .agg(
            F.min_by(F.col("value"), ord_struct).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("value"), ord_struct).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


COOLDOWN_STATE_SCHEMA = T.StructType(
    [T.StructField("last_us", T.LongType(), True)]
)


def cooldown_events(
    events: DataFrame,
    key_cols: tuple[str, str] = ("user_id", "event_type"),
    gap_seconds: int = 600,
    watermark: str = "2 hours",
    timeout_ms: int = 2 * 60 * 60 * 1000,
) -> DataFrame:
    """Streaming COOL-DOWN limiter: per key, admit an event only when
    ``gap_seconds`` have passed since the last ADMITTED one — each
    admission resets the clock (the alerting/notification policy;
    ``throttle_events`` caps per fixed bucket instead, and streaming
    ``dedup_events`` drops by id).  State is ONE long (last admitted
    event-time micros) per key — bounded, timeout-expired.

    Within a micro-batch admission follows (ts, event_id) order;
    across micro-batches it is by arrival (admissions are never
    revoked), so late data can diverge from the batch twin — the same
    owned divergence as the rate limiter.  The batch twin
    ``operators/bursts.cooldown_throttle`` (oracle-checked,
    `events_cooldown_throttle`) pins the greedy-admission semantics.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last,) = state.get if state.exists else (-(2**62),)
        rows = pd.concat(list(pdfs))
        # NULL event times have no position in event time — drop them,
        # matching the batch twin's contract (a NaT .value is a huge
        # negative ns count that would otherwise be admitted).
        rows = rows[rows["ts"].notna()].sort_values(["ts", "event_id"])
        keep = []
        for i, t in enumerate(rows["ts"]):
            t_us = t.value // 1000  # pandas ns -> micros
            if t_us - last >= gap_us:
                keep.append(i)
                last = t_us
        state.update((int(last),))
        state.setTimeoutDuration(timeout_ms)
        if keep:
            yield rows.iloc[keep][
                ["event_id", "ts", "user_id", "event_type", "value"]
            ]

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=COOLDOWN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )

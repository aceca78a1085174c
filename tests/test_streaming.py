"""Structured Streaming ingestion: windows, watermark, dedup, sessions.

Streams are driven end-to-end with availableNow triggers into memory
sinks; results are compared against the equivalent batch computation on
the same data (the batch twin is itself oracle-checked in the contract).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.streaming import ingest

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(offsets_minutes, user_ids, values, start_id=0):
    return [
        (
            start_id + i,
            BASE + datetime.timedelta(minutes=m),
            u,
            "click",
            v,
            "{}",
        )
        for i, (m, u, v) in enumerate(zip(offsets_minutes, user_ids, values))
    ]


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    rows = _mk_events(
        offsets_minutes=[0, 10, 50, 65, 70, 130, 200, 200],
        user_ids=[1, 1, 2, 1, 2, 3, 1, 1],
        values=[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0],
    )
    # duplicate the last event (same event_id+ts) to exercise dedup
    rows.append(rows[-1])
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    # two files -> two discoverable chunks
    df.filter("event_id < 5").coalesce(1).write.mode("overwrite").parquet(
        str(d / "chunk1")
    )
    df.filter("event_id >= 5").coalesce(1).write.mode("overwrite").parquet(
        str(d / "chunk2")
    )
    # single flat dir for the file source
    flat = tmp_path_factory.mktemp("events_flat")
    for i, sub in enumerate(["chunk1", "chunk2"]):
        for f in (d / sub).glob("*.parquet"):
            (flat / f"part{i}_{f.name}").write_bytes(f.read_bytes())
    return str(flat)


def test_tumbling_counts_match_batch(spark, source_dir):
    stream = ingest.stream_events(spark, source_dir)
    assert stream.isStreaming
    ingest.run_to_memory(
        ingest.tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    got = {
        r["window_start"]: r["event_count"]
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = spark.read.parquet(source_dir)
    expected = {
        r["window_start"]: r["event_count"]
        for r in ingest.tumbling_counts(batch).collect()
    }
    assert got == expected
    assert sum(got.values()) == 9  # dedup NOT applied here: 9 raw rows


def test_tumbling_append_emits_closed_windows(spark, tmp_path):
    """APPEND-mode watermarked tumbling windows emit exactly the CLOSED
    set — windows whose end <= final watermark = max(ts) - delay, with
    the boundary pinned INCLUSIVE by an event placing the watermark
    exactly on a window end.  This is the semantics contract the
    events_tumbling_window_stream driver row's oracle (batch tumbling
    restricted to that boundary) relies on."""
    rows = [
        (i, BASE + datetime.timedelta(minutes=m), 1, "click", 1.0, "{}")
        # max ts = minute 240 -> watermark = minute 120: [0,60) closed,
        # [60,120) end == watermark (boundary case, emitted), [120,180)
        # and [240,300) open
        for i, m in enumerate([10, 70, 130, 240])
    ]
    d = str(tmp_path / "events_boundary")
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = ingest.stream_events(spark, d)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    ingest.run_to_memory(agg, "t_tumbling_append", output_mode="append")
    got = {
        r["window_start"]: r["n"]
        for r in spark.sql("SELECT * FROM t_tumbling_append").collect()
    }
    assert got == {
        BASE: 1,
        BASE + datetime.timedelta(hours=1): 1,  # end == watermark: kept
    }


def test_session_append_emits_closed_sessions_and_merges(spark, tmp_path):
    """APPEND-mode watermarked SESSION windows emit exactly the CLOSED
    set — sessions whose end = last_event_ts + gap <= final watermark
    = max(ts) - delay, boundary INCLUSIVE (an event places the
    watermark exactly on a session end).  Also pins the MERGE
    semantics: two events 20 minutes apart fuse into one session under
    a 30-minute gap.  This is the contract the
    events_session_window_stream driver row's oracle (gaps-and-islands
    batch sessionization restricted to that boundary) relies on."""
    rows = [
        # user 1: events at minutes 0 and 20 merge (gap 20 < 30) into
        # one session ending at minute 50; max ts = minute 170 ->
        # watermark = minute 50: end == watermark, boundary case, KEPT
        (0, BASE, 1, "click", 1.0, "{}"),
        (1, BASE + datetime.timedelta(minutes=20), 1, "click", 1.0, "{}"),
        # user 2: event at minute 30 -> session ends minute 60 > wm: open
        (2, BASE + datetime.timedelta(minutes=30), 2, "click", 1.0, "{}"),
        # user 3: the watermark-setting event; its own session is open
        (3, BASE + datetime.timedelta(minutes=170), 3, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "events_session_boundary")
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = ingest.stream_events(spark, d)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("session_start"), "n")
    )
    ingest.run_to_memory(
        agg, "t_session_append", output_mode="append", max_data_batches=1
    )
    got = {
        (r["user_id"], r["session_start"]): r["n"]
        for r in spark.sql("SELECT * FROM t_session_append").collect()
    }
    # ONLY user 1's merged 2-event session (end == watermark: kept)
    assert got == {(1, BASE): 2}


def test_session_append_rocksdb_state_store_parity(spark, tmp_path):
    """The same closed-session emission under the RocksDB state-store
    provider (the 100 TB large-state posture: off-heap/disk state +
    changelog checkpointing instead of every key on the JVM heap) —
    results must be provider-independent."""
    from netflix_data_ingestion_spark.session import ROCKSDB_STATE_CONF

    rows = [
        (0, BASE, 1, "click", 1.0, "{}"),
        (1, BASE + datetime.timedelta(minutes=20), 1, "click", 1.0, "{}"),
        (2, BASE + datetime.timedelta(minutes=30), 2, "click", 1.0, "{}"),
        (3, BASE + datetime.timedelta(minutes=170), 3, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "events_rocksdb")
    spark.createDataFrame(rows, ingest.EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    saved = {
        k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF
    }
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        stream = ingest.stream_events(spark, d)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"),
                F.col("user_id"),
            )
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("session_start"), "n")
        )
        ingest.run_to_memory(
            agg, "t_session_rocksdb", output_mode="append", max_data_batches=1
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    got = {
        (r["user_id"], r["session_start"]): r["n"]
        for r in spark.sql("SELECT * FROM t_session_rocksdb").collect()
    }
    # identical emission to the default-provider test above
    assert got == {(1, BASE): 2}


def test_run_to_memory_max_data_batches_guard(spark, tmp_path):
    """run_to_memory(max_data_batches=1) raises when availableNow
    splits the source into multiple data micro-batches (here forced
    with maxFilesPerTrigger=1 over a 2-file source) — the enforcement
    that protects the closed-window oracles' single-batch assumption."""
    rows = [
        (i, BASE + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(4)
    ]
    d = str(tmp_path / "events_two_files")
    spark.createDataFrame(rows, ingest.EVENT_SCHEMA).repartition(2).write.mode(
        "overwrite"
    ).parquet(d)
    stream = (
        spark.readStream.schema(ingest.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = stream.groupBy("user_id").count()
    with pytest.raises(RuntimeError, match="data micro-batches"):
        ingest.run_to_memory(
            agg, "t_two_batches", output_mode="complete", max_data_batches=1
        )
    # and the same source without the cap passes the guard
    stream2 = spark.readStream.schema(ingest.EVENT_SCHEMA).parquet(d)
    ingest.run_to_memory(
        stream2.groupBy("user_id").count(),
        "t_one_batch",
        output_mode="complete",
        max_data_batches=1,
    )
    assert spark.sql("SELECT * FROM t_one_batch").count() == 1


def test_streaming_dedup(spark, source_dir):
    stream = ingest.stream_events(spark, source_dir)
    ingest.run_to_memory(ingest.dedup_events(stream), "t_dedup")
    rows = spark.sql("SELECT * FROM t_dedup").collect()
    assert len(rows) == 8  # 9 raw rows, one exact duplicate removed
    ids = sorted(r["event_id"] for r in rows)
    assert ids == list(range(8))


def test_sliding_windows(spark, source_dir):
    stream = ingest.stream_events(spark, source_dir)
    ingest.run_to_memory(
        ingest.sliding_type_counts(stream), "t_sliding", output_mode="complete"
    )
    rows = spark.sql("SELECT * FROM t_sliding").collect()
    # event at minute 10 belongs to windows starting at -30 and 0
    starts = {
        r["window_start"] for r in rows if r["event_count"] >= 1
    }
    assert BASE in starts
    assert BASE - datetime.timedelta(minutes=30) in starts


def test_session_windows(spark, source_dir):
    stream = ingest.stream_events(spark, source_dir)
    ingest.run_to_memory(
        ingest.session_windows(stream, gap="30 minutes"),
        "t_sessions",
        output_mode="complete",
    )
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1 events at minutes 0,10 | 65 | 200,200,200(dup) with a 30-min
    # gap -> three sessions of sizes 2, 1, 3 (dedup not applied here)
    assert len(by_user[1]) == 3
    sizes = sorted(r["events_in_session"] for r in by_user[1])
    assert sizes == [1, 2, 3]
    # user 3: single event
    assert len(by_user[3]) == 1


@pytest.fixture(scope="module")
def streak_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("streak_events")
    rows = []
    # user 1: error error error click  -> completed streak of 3
    # user 2: error click              -> streak of 1, below min_streak
    # user 3: click error error        -> trailing streak, NOT completed
    seq = [
        (1, "error"), (1, "error"), (1, "error"), (1, "click"),
        (2, "error"), (2, "click"),
        (3, "click"), (3, "error"), (3, "error"),
    ]
    for i, (u, et) in enumerate(seq):
        rows.append(
            (i, BASE + datetime.timedelta(minutes=i), u, et, 1.0, "{}")
        )
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_error_streaks_stateful(spark, streak_dir):
    stream = ingest.stream_events(spark, streak_dir)
    out = ingest.error_streaks(stream, min_streak=2)
    q = (
        out.writeStream.format("memory")
        .queryName("streaks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["streak_len"])
        for r in spark.table("streaks").collect()
    }
    # only user 1's broken streak of 3 qualifies (user 3's never breaks
    # within the data; timeout flush doesn't fire in availableNow runs)
    assert got == {(1, 3)}


def test_error_streaks_batch_twin(spark, streak_dir):
    events = spark.read.parquet(streak_dir)
    got = {
        (r["user_id"], r["streak_len"])
        for r in ingest.error_streaks_batch(events, min_streak=2).collect()
    }
    assert got == {(1, 3)}


def test_stream_static_enrichment(spark, source_dir):
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = ingest.stream_events(spark, source_dir)
    q = (
        ingest.enrich_with_dim(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("enriched").collect()
    tiers = {r["user_id"]: r["tier"] for r in rows}
    assert tiers[1] == "gold" and tiers[2] == "silver"
    assert tiers[3] is None  # left join keeps unmatched stream rows


def test_idempotent_foreachbatch_sink(spark, source_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = ingest.stream_events(spark, source_dir)
    q = ingest.write_idempotent_parquet(stream, out, ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # re-running with the same checkpoint replays nothing -> same count
    q2 = ingest.write_idempotent_parquet(
        ingest.stream_events(spark, source_dir), out, ckpt
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 9  # all fixture rows, exactly once


def test_streaming_dedup_drops_replayed_id_with_drifted_ts(
    spark, tmp_path_factory
):
    """A producer retry re-emits event_id=1 with a fresh (drifted) ts;
    dedup keys on event_id ALONE within the watermark, so the replay is
    dropped — the behavior dropDuplicates([id, ts]) could not give."""
    d = tmp_path_factory.mktemp("events_replay")
    rows = [
        (1, BASE, 1, "click", 1.0, "{}"),
        (1, BASE + datetime.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (2, BASE + datetime.timedelta(minutes=10), 2, "click", 2.0, "{}"),
    ]
    spark.createDataFrame(rows, ingest.EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d))
    stream = ingest.stream_events(spark, str(d))
    ingest.run_to_memory(ingest.dedup_events(stream), "t_dedup_replay")
    rows_out = spark.sql("SELECT * FROM t_dedup_replay").collect()
    assert sorted(r["event_id"] for r in rows_out) == [1, 2]


def test_stream_stream_join_clicks_to_errors(spark, tmp_path_factory):
    """Stream-stream inner join with watermarks + time-bound condition;
    result must equal the identical batch join on the same data."""
    d = tmp_path_factory.mktemp("events_ss_join")
    rows = [
        # user 1: clicks at 0, 5, 20 min; error at 12 -> joins clicks 5 (and
        # NOT 0: 12 > 0+10) within the 10-minute lookback; error at 21 ->
        # joins click 20
        (10, BASE, 1, "click", 1.0, "{}"),
        (11, BASE + datetime.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (12, BASE + datetime.timedelta(minutes=12), 1, "error", 0.0, "{}"),
        (13, BASE + datetime.timedelta(minutes=20), 1, "click", 1.0, "{}"),
        (14, BASE + datetime.timedelta(minutes=21), 1, "error", 0.0, "{}"),
        # user 2: click far from its error -> no match
        (20, BASE, 2, "click", 1.0, "{}"),
        (21, BASE + datetime.timedelta(minutes=45), 2, "error", 0.0, "{}"),
    ]
    spark.createDataFrame(rows, ingest.EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d))

    stream = ingest.stream_events(spark, str(d))
    ingest.run_to_memory(
        ingest.join_clicks_to_errors(stream), "t_ss_join"
    )
    got = {
        (r["error_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM t_ss_join").collect()
    }
    batch = spark.read.parquet(str(d))
    expected = {
        (r["error_id"], r["click_id"])
        for r in ingest.join_clicks_to_errors(batch).collect()
    }
    assert got == expected
    assert got == {(12, 11), (14, 13)}


def test_streaming_cdc_apply(spark, tmp_path_factory):
    """Micro-batched CDC changes fold into a parquet snapshot via MERGE:
    inserts, latest-wins updates (within and across batches), tombstone
    deletes — and a checkpoint-replayed run converges, not duplicates."""
    d = tmp_path_factory.mktemp("cdc")
    src, snap, ckpt = str(d / "src"), str(d / "snap"), str(d / "ckpt")
    schema = "k long, ts timestamp, seg string, deleted boolean"

    def emit(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")
        import glob
        import shutil

        flat = f"{src}/flat"
        import os

        os.makedirs(flat, exist_ok=True)
        for f in glob.glob(f"{src}/{name}/*.parquet"):
            shutil.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")
        return flat

    t0 = BASE
    t1 = BASE + datetime.timedelta(minutes=1)
    flat = emit(
        [
            (1, t0, "a", False),
            (2, t0, "b", False),
            (2, t1, "b2", False),   # same-batch update: latest ts wins
            (3, t0, "c", False),
        ],
        "batch1",
    )
    flat = emit(
        [
            (3, t1, None, True),    # delete k=3
            (4, t0, "d", False),    # insert k=4
            (1, t1, "a2", False),   # cross-batch update
        ],
        "batch2",
    )

    changes = (
        spark.readStream.format("parquet").schema(schema).load(flat)
    )
    q = ingest.apply_cdc_stream(
        changes, snap, ckpt, ["k"], ["ts", "seg"], tombstone_col="deleted"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    state = {
        r["k"]: r["seg"]
        for r in ingest.read_cdc_snapshot(spark, snap).collect()
    }
    assert state == {1: "a2", 2: "b2", 4: "d"}

    # replay with the same checkpoint: no new batches -> state unchanged
    q2 = ingest.apply_cdc_stream(
        spark.readStream.format("parquet").schema(schema).load(flat),
        snap,
        ckpt,
        ["k"],
        ["ts", "seg"],
        tombstone_col="deleted",
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    state2 = {
        r["k"]: r["seg"]
        for r in ingest.read_cdc_snapshot(spark, snap).collect()
    }
    assert state2 == state


def test_streaming_cdc_restart_between_batches(spark, tmp_path_factory):
    """Kill/restart between micro-batches: batch1 is processed, the query
    stops, batch2 arrives, a NEW query starts on the same checkpoint.
    The alternating-dir snapshot must resume from the committed side —
    batch1's effects survive, batch2 merges on top, and the replayed
    run processes only the new files."""
    d = tmp_path_factory.mktemp("cdc_restart")
    src, snap, ckpt = str(d / "src"), str(d / "snap"), str(d / "ckpt")
    schema = "k long, ts timestamp, seg string, deleted boolean"
    import os

    flat = f"{src}/flat"
    os.makedirs(flat, exist_ok=True)

    def emit(rows, name):
        stage = f"{src}/{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        import glob
        import shutil

        for f in glob.glob(f"{stage}/*.parquet"):
            shutil.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    def run_once():
        q = ingest.apply_cdc_stream(
            spark.readStream.format("parquet").schema(schema).load(flat),
            snap,
            ckpt,
            ["k"],
            ["ts", "seg"],
            tombstone_col="deleted",
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    t0 = BASE
    t1 = BASE + datetime.timedelta(minutes=1)
    emit([(1, t0, "a", False), (2, t0, "b", False)], "batch1")
    run_once()  # first run ends (the "kill"): snapshot side committed
    side1 = open(f"{snap}/CURRENT").read().strip()
    state1 = {
        r["k"]: r["seg"]
        for r in ingest.read_cdc_snapshot(spark, snap).collect()
    }
    assert state1 == {1: "a", 2: "b"}

    emit([(2, t1, None, True), (3, t0, "c", False)], "batch2")
    run_once()  # restart on the same checkpoint: only batch2 is new
    side2 = open(f"{snap}/CURRENT").read().strip()
    state2 = {
        r["k"]: r["seg"]
        for r in ingest.read_cdc_snapshot(spark, snap).collect()
    }
    assert state2 == {1: "a", 3: "c"}        # delete applied, insert merged
    assert side2 != side1                    # the snapshot dir alternated
    assert {side1, side2} <= {"a", "b"}


def test_streaming_cms_maintenance(spark, tmp_path_factory):
    """Micro-batched CMS maintenance: per-batch sketches fold into the
    snapshot via the algebraic combine, and the final snapshot equals
    the batch sketch of the whole stream (associativity made physical)."""
    from netflix_data_ingestion_spark.operators import sketch

    d = tmp_path_factory.mktemp("cms_stream")
    src, snap, ckpt = str(d / "src"), str(d / "snap"), str(d / "ckpt")
    import os

    flat = f"{src}/flat"
    os.makedirs(flat, exist_ok=True)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def emit(ids_users, name):
        rows = [
            (i, BASE + datetime.timedelta(minutes=i), u, "view", 1.0, "{}")
            for i, u in ids_users
        ]
        stage = f"{src}/{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        import glob
        import shutil

        for f in glob.glob(f"{stage}/*.parquet"):
            shutil.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    emit([(i, i % 3) for i in range(30)], "b1")
    emit([(100 + i, 7) for i in range(20)], "b2")

    q = ingest.maintain_cms_stream(
        spark.readStream.format("parquet").schema(schema).load(flat),
        snap,
        ckpt,
        "user_id",
        width=32,
        depth=4,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    snapshot = ingest.read_cdc_snapshot(spark, snap)
    whole = spark.read.parquet(flat)
    expected = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketch.cms_build(whole, "user_id", 32, 4).collect()
    }
    got = {
        (r["row"], r["bucket"]): r["cnt"] for r in snapshot.collect()
    }
    assert got == expected
    # and the probe sees the heavy hitter with a one-sided estimate
    est = {
        r["user_id"]: r["est"]
        for r in sketch.cms_estimate(
            snapshot, whole.select("user_id").distinct(), "user_id", 32, 4
        ).collect()
    }
    assert est[7] >= 20


def test_streaming_moments_maintenance_and_anomaly_parity(
    spark, tmp_path_factory
):
    """Micro-batched moments maintenance: per-batch (n, s, q) fold into
    the snapshot algebraically, the final baseline equals the batch
    moments of the whole stream, and screening the stream against it
    flags exactly what the batch twin (zscore_outliers) flags."""
    from netflix_data_ingestion_spark.operators import outliers

    d = tmp_path_factory.mktemp("mom_stream")
    src, snap, ckpt = str(d / "src"), str(d / "snap"), str(d / "ckpt")
    import os

    flat = f"{src}/flat"
    os.makedirs(flat, exist_ok=True)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def emit(rows, name):
        stage = f"{src}/{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        import glob
        import shutil

        for f in glob.glob(f"{stage}/*.parquet"):
            shutil.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    def ev(i, typ, v):
        return (i, BASE + datetime.timedelta(minutes=i), 1, typ, v, "{}")

    # "view" flat at 10.0 with one planted spike; "click" flat
    emit([ev(i, "view", 10.0) for i in range(10)], "b1")
    emit(
        [ev(100 + i, "view", 10.0) for i in range(9)]
        + [ev(199, "view", 1000.0)]
        + [ev(300 + i, "click", 5.0) for i in range(5)],
        "b2",
    )

    q = ingest.maintain_moments_stream(
        spark.readStream.format("parquet").schema(schema).load(flat),
        snap,
        ckpt,
        ["event_type"],
        "value",
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    snapshot = ingest.read_cdc_snapshot(spark, snap)
    whole = spark.read.parquet(flat)
    want_stats = {
        r["event_type"]: (r["__n"], r["__s"], r["__q"])
        for r in outliers.moments_build(
            whole, ["event_type"], "value"
        ).collect()
    }
    got_stats = {
        r["event_type"]: (r["__n"], r["__s"], r["__q"])
        for r in snapshot.collect()
    }
    assert got_stats == want_stats

    flagged = outliers.zscore_flag(
        whole, snapshot, ["event_type"], "value", z_num=3
    ).collect()
    twin = outliers.zscore_outliers(
        whole, ["event_type"], "value", z_num=3
    ).collect()
    assert sorted(r["event_id"] for r in flagged) == sorted(
        r["event_id"] for r in twin
    )
    assert [r["event_id"] for r in flagged] == [199]


def test_streaming_hll_maintenance_idempotent_under_replay(
    spark, tmp_path_factory
):
    """HLL registers MAX-fold per micro-batch; the final snapshot equals
    the batch sketch of the whole stream, and re-folding a batch (replay)
    cannot move the registers — MAX is idempotent."""
    from netflix_data_ingestion_spark.operators import sketch
    from netflix_data_ingestion_spark.operators.merge import merge_aggregates

    d = tmp_path_factory.mktemp("hll_stream")
    src, snap, ckpt = str(d / "src"), str(d / "snap"), str(d / "ckpt")
    import os

    flat = f"{src}/flat"
    os.makedirs(flat, exist_ok=True)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def emit(ids_users, name):
        rows = [
            (i, BASE + datetime.timedelta(minutes=i), u, "view", 1.0, "{}")
            for i, u in ids_users
        ]
        stage = f"{src}/{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        import glob
        import shutil

        for f in glob.glob(f"{stage}/*.parquet"):
            shutil.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    emit([(i, i % 40) for i in range(60)], "b1")
    emit([(100 + i, 30 + i) for i in range(30)], "b2")

    q = ingest.maintain_hll_stream(
        spark.readStream.format("parquet").schema(schema).load(flat),
        snap,
        ckpt,
        "user_id",
        buckets=32,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    snapshot = ingest.read_cdc_snapshot(spark, snap)
    whole = spark.read.parquet(flat)
    want = {
        r["bucket"]: r["register"]
        for r in sketch.hll_registers(whole, "user_id", 32).collect()
    }
    got = {r["bucket"]: r["register"] for r in snapshot.collect()}
    assert got == want
    # replay: folding batch 1 in again must be a no-op
    replay = merge_aggregates(
        snapshot,
        sketch.hll_registers(
            whole.where("event_id < 60"), "user_id", 32
        ),
        ["bucket"],
        max_cols=["register"],
    )
    assert {
        r["bucket"]: r["register"] for r in replay.collect()
    } == want


@pytest.fixture(scope="module")
def throttle_dir(spark, tmp_path_factory):
    # user 1: five events inside hour 0 (cap bites), one in hour 2;
    # user 2: two events in hour 0 (under cap). Split across two files
    # so admission spans micro-batches.
    rows = _mk_events(
        offsets_minutes=[0, 5, 10, 15, 20, 125, 7, 30],
        user_ids=[1, 1, 1, 1, 1, 1, 2, 2],
        values=[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    )
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    flat = tmp_path_factory.mktemp("throttle_flat")
    for i, pred in enumerate(["event_id < 4", "event_id >= 4"]):
        part = str(flat / f"f{i}.parquet")
        import glob as _g
        import os as _os
        import shutil as _sh

        tmp = str(flat / f"tmp{i}")
        df.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = _g.glob(tmp + "/*.parquet")[0]
        _sh.copyfile(src, part)
        _sh.rmtree(tmp)
    return str(flat)


def test_throttle_stream_caps_per_bucket(spark, throttle_dir):
    stream = ingest.stream_events(spark, throttle_dir)
    out = ingest.throttle_events(
        stream, key_col="user_id", bucket="hour", limit=3
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_throttle")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_throttle").collect()
    by_bucket = {}
    for r in got:
        key = (r["user_id"], r["ts"].hour)
        by_bucket.setdefault(key, []).append(r["event_id"])
    # cap holds per (user, hour) even across micro-batches
    assert all(len(v) <= 3 for v in by_bucket.values())
    assert len(by_bucket[(1, 0)]) == 3
    # under-cap buckets pass through whole
    assert sorted(by_bucket[(2, 0)]) == [6, 7]
    assert by_bucket[(1, 2)] == [5]


def test_throttle_key_scope_matches_bucket_scope(spark, throttle_dir):
    """state_scope="key" (per-key bucket->kept map, r12 optimization)
    must admit the exact same event set as the per-(key, bucket) state
    layout — including across micro-batches (the two-file fixture), so
    the prev-state merge path inside fn_key is exercised."""
    results = {}
    for scope in ("bucket", "key"):
        stream = ingest.stream_events(spark, throttle_dir)
        out = ingest.throttle_events(
            stream, key_col="user_id", bucket="hour", limit=3,
            state_scope=scope,
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"t_throttle_{scope}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results[scope] = {
            tuple(r) for r in spark.table(f"t_throttle_{scope}").collect()
        }
    assert results["key"] == results["bucket"]
    assert len(results["key"]) == 6  # ids 0,1,2,5,6,7 survive the cap


def test_throttle_batch_twin_event_time_order(spark, throttle_dir):
    events = spark.read.parquet(throttle_dir)
    got = ingest.throttle_events_batch(
        events, key_col="user_id", bucket="hour", limit=3
    ).collect()
    ids = sorted(r["event_id"] for r in got)
    # batch twin admits the FIRST 3 by event time: ids 0,1,2 for user 1
    # hour 0; everything else under cap
    assert ids == [0, 1, 2, 5, 6, 7]


def test_throttle_restart_preserves_state(spark, tmp_path_factory):
    """Kill/restart between micro-batches: the per-(key, bucket) kept
    count must survive in the checkpoint — 2 events admitted before the
    restart leave room for exactly 1 more under a cap of 3."""
    import glob as _g
    import os as _os
    import shutil as _sh

    d = tmp_path_factory.mktemp("throttle_restart")
    flat, ckpt = str(d / "flat"), str(d / "ckpt")
    _os.makedirs(flat, exist_ok=True)

    def emit(rows, name):
        stage = str(d / name)
        spark.createDataFrame(rows, ingest.EVENT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        for f in _g.glob(f"{stage}/*.parquet"):
            _sh.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    sink = str(d / "sink")

    def run_once():
        out = ingest.throttle_events(
            ingest.stream_events(spark, flat),
            key_col="user_id",
            bucket="hour",
            limit=3,
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emit(_mk_events([0, 1], [1, 1], [1.0, 2.0], start_id=0), "b1")
    run_once()  # first run ends (the "kill"): 2 of 3 slots used
    assert sorted(
        r["event_id"] for r in spark.read.parquet(sink).collect()
    ) == [0, 1]

    emit(_mk_events([2, 3, 4], [1, 1, 1], [3.0, 4.0, 5.0], start_id=2), "b2")
    run_once()  # restart on the same checkpoint: state must remember 2
    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    # only ONE slot remained, taken by the earliest (ts, event_id) of
    # the new batch — a lost state would have admitted all three
    assert got == [0, 1, 2]


def test_ohlc_stream_matches_batch_resample(spark, source_dir):
    from netflix_data_ingestion_spark.operators.resample import ohlc_resample

    stream = ingest.stream_events(spark, source_dir)
    q = (
        ingest.ohlc_stream(stream, key_col="user_id")
        .writeStream.format("memory")
        .queryName("t_ohlc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in spark.table("t_ohlc").collect()
    }
    batch = spark.read.parquet(source_dir)
    expect = {
        (r["user_id"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_resample(
            batch, ["user_id"], "ts", "event_id", "value"
        ).collect()
    }
    # append mode emits only bars whose window CLOSED under the
    # watermark (the last ~2h of windows stay open) — every emitted bar
    # must equal its batch twin exactly, and the early bars must have
    # been emitted
    assert len(got) > 0
    assert all(expect[k] == v for k, v in got.items())
    assert (1, datetime.datetime(2024, 1, 1, 0, 0)) in got
    assert (2, datetime.datetime(2024, 1, 1, 0, 0)) in got


def test_cooldown_stream_matches_batch_twin_in_order(spark, tmp_path_factory):
    """Single-file replay (event-time order == arrival order): the
    streamed cool-down admissions equal the oracle-pinned batch twin
    exactly; state carries the last ADMITTED time across events."""
    from netflix_data_ingestion_spark.operators.bursts import (
        cooldown_throttle,
    )

    # user 1 'click': minutes 0, 5, 12, 13, 30 with a 10-min cool-down
    # -> admit 0, 12, 30; user 2 single event passes
    rows = _mk_events(
        offsets_minutes=[0, 5, 12, 13, 30, 3],
        user_ids=[1, 1, 1, 1, 1, 2],
        values=[1.0] * 6,
    )
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    flat = tmp_path_factory.mktemp("cooldown_flat")
    import glob as _g
    import shutil as _sh

    tmp = str(flat / "tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    _sh.copyfile(_g.glob(tmp + "/*.parquet")[0], str(flat / "f0.parquet"))
    _sh.rmtree(tmp)

    stream = ingest.stream_events(spark, str(flat))
    out = ingest.cooldown_events(
        stream, key_cols=("user_id", "event_type"), gap_seconds=600
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_cooldown")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        r["event_id"] for r in spark.table("t_cooldown").collect()
    )
    batch = sorted(
        r["event_id"]
        for r in cooldown_throttle(
            df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=600
        ).collect()
    )
    assert streamed == batch
    assert streamed == [0, 2, 4, 5]


def test_cooldown_restart_preserves_last_admission(spark, tmp_path_factory):
    """Kill/restart between micro-batches: the last-admitted time must
    survive in the checkpoint — an event arriving after the restart but
    INSIDE the cool-down of a pre-restart admission stays suppressed;
    one past the window is admitted."""
    import glob as _g
    import os as _os
    import shutil as _sh

    d = tmp_path_factory.mktemp("cooldown_restart")
    flat, ckpt = str(d / "flat"), str(d / "ckpt")
    _os.makedirs(flat, exist_ok=True)

    def emit(rows, name):
        stage = str(d / name)
        spark.createDataFrame(rows, ingest.EVENT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        for f in _g.glob(f"{stage}/*.parquet"):
            _sh.copy(f, f"{flat}/{name}_{f.split('/')[-1]}")

    sink = str(d / "sink")

    def run_once():
        out = ingest.cooldown_events(
            ingest.stream_events(spark, flat),
            key_cols=("user_id", "event_type"),
            gap_seconds=600,
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # minute 0 admitted, minute 5 suppressed; then the "kill"
    emit(_mk_events([0, 5], [1, 1], [1.0, 2.0], start_id=0), "b1")
    run_once()
    assert sorted(
        r["event_id"] for r in spark.read.parquet(sink).collect()
    ) == [0]

    # restart: minute 8 still inside the 10-min window of the minute-0
    # admission (lost state would admit it); minute 11 clears it
    emit(_mk_events([8, 11], [1, 1], [3.0, 4.0], start_id=2), "b2")
    run_once()
    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert got == [0, 3]


def test_cooldown_stream_drops_null_event_times(spark, tmp_path_factory):
    """A NULL-ts event must NOT be admitted (a NaT .value is a huge
    negative ns count that, unfiltered, always clears the cool-down
    gap) — matching the batch twin's NULL-ts contract."""
    rows = _mk_events(
        offsets_minutes=[0, 5], user_ids=[1, 1], values=[1.0, 1.0]
    )
    # event 2: NULL ts for the same key; event 3: a different key, valid
    rows.append((2, None, 1, "click", 1.0, "{}"))
    rows.append((3, BASE, 2, "click", 1.0, "{}"))
    df = spark.createDataFrame(rows, ingest.EVENT_SCHEMA)
    flat = tmp_path_factory.mktemp("cooldown_null")
    import glob as _g
    import shutil as _sh

    tmp = str(flat / "tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    _sh.copyfile(_g.glob(tmp + "/*.parquet")[0], str(flat / "f0.parquet"))
    _sh.rmtree(tmp)

    stream = ingest.stream_events(spark, str(flat))
    out = ingest.cooldown_events(
        stream, key_cols=("user_id", "event_type"), gap_seconds=600
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_cooldown_null")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        r["event_id"] for r in spark.table("t_cooldown_null").collect()
    )
    # user 1: admit minute-0 only (minute-5 inside the gap, NULL-ts
    # dropped); user 2: its single valid event
    assert streamed == [0, 3]


def test_streaming_media_decode_matches_batch(spark, tmp_path_factory):
    """The real codec stages are stateless Arrow mapInPandas, so they
    must run UNCHANGED on a readStream frame: a mixed corpus (WAV at
    two depths, an animated GIF, an AVI, junk, NULL) decoded through
    decode_audio_features and gif/avi frame stats in streaming mode
    must equal the batch twin row for row.  (MP4 rides along: the
    ISO BMFF walk is the same stateless Arrow stage class.)"""
    import numpy as np

    from netflix_data_ingestion_spark.operators.audio import (
        decode_audio_features,
        encode_wav,
    )
    from netflix_data_ingestion_spark.operators.avi import encode_avi
    from netflix_data_ingestion_spark.operators.gif import encode_gif
    from netflix_data_ingestion_spark.operators.mp4 import encode_mp4
    from netflix_data_ingestion_spark.operators.multimodal import (
        avi_frame_stats,
        gif_frame_stats,
        mp4_frame_stats,
    )

    rng = np.random.default_rng(5)
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    rows = [
        (1, bytearray(encode_wav(
            rng.integers(-128, 128, size=80, dtype=np.int64), 1, 8000, 8))),
        (2, bytearray(encode_wav(
            rng.integers(-30000, 30000, size=50, dtype=np.int64), 1, 16000, 16))),
        (3, bytearray(encode_gif(
            [rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
             for _ in range(3)], gray))),
        (4, bytearray(encode_avi(
            [rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
             for _ in range(2)]))),
        (5, bytearray(b"junk payload")),
        (6, None),
        (7, bytearray(encode_mp4(
            [rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
             for _ in range(2)]))),
    ]
    src = str(tmp_path_factory.mktemp("media_stream"))
    spark.createDataFrame(
        rows, "media_id long, payload binary"
    ).repartition(3).write.mode("overwrite").parquet(src)

    stream = ingest.stream_media(spark, src)
    assert stream.isStreaming
    batch = spark.read.schema(ingest.MEDIA_STREAM_SCHEMA).parquet(src)

    for name, op in (
        ("m_audio", decode_audio_features),
        ("m_gif", gif_frame_stats),
        ("m_avi", avi_frame_stats),
        ("m_mp4", mp4_frame_stats),
    ):
        ingest.run_to_memory(op(stream), name, output_mode="append")
        got = sorted(
            tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        want = sorted(tuple(r) for r in op(batch).collect())
        assert got == want, name
    # sanity: the streaming path really decoded (not all-NULL rows)
    decoded = spark.sql(
        "SELECT count(*) AS n FROM m_audio WHERE codec = 'wav'"
    ).collect()[0]["n"]
    assert decoded == 2

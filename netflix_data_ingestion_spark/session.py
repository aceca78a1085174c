"""SparkSession factory.

Replaces the reference's SparkSessionManager (etl_pipeline_spark.py:580-639)
with a Spark-first configuration:

- AQE + partition coalescing + skew-join handling ON (the reference enables
  AQE at etl_pipeline_spark.py:612-613; we add skewJoin which it lacks).
- auto-broadcast ON (the reference disables it at :625 and hand-places
  broadcast() hints; letting Catalyst decide is strictly better here since
  our dimensions are genuinely small).
- shuffle partitions sized to the local core count rather than the
  reference's fixed 200 (:153-154) — at cluster scale this would be set to
  ~2-3x total executor cores, or left to AQE coalescing.
- Arrow enabled for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "netflix-data-ingestion-spark"


def default_parallelism() -> int:
    """Shuffle-partition default: env override, else local core count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


# Ingest-plane Python-worker watchdog (COVERAGE.md "honest flake record",
# r11): one 800M-row run in four parked a fact-stage task 19+ minutes in
# epoll on the socket of a VANISHED ffill-Arrow Python worker (daemon
# alive, no worker children, zero Python CPU).  Local mode has no
# speculative-execution reaper, and the deterministic-ffill contract
# (ffill.py localCheckpoint) forbids recompute-based retry — so the right
# posture is fast, diagnosable failure, not a silent infinite hang:
#   - idleTimeoutSeconds + killOnIdleTimeout: the JVM-side monitor kills a
#     worker that produced no socket activity for 10 min (the ffill stage
#     exchanges Arrow batches every few seconds; the whole 800M fact stage
#     is ~7 min, so a 10-min silent window is unambiguous death), which
#     closes the socket and fails the task promptly instead of 19+ min.
#   - faulthandler: if the worker CRASHES (vs being externally killed),
#     capture its stack in the task error so the next occurrence is
#     diagnosable rather than a bare EOF.
#   - killWorkerOnFlushFailure: don't swallow output-flush failures into
#     a zombie worker; die loudly so Spark relaunches and retries.
# Scoped to the ingest plane (measure_ingest / StarPipeline callers pass
# this as extra_conf) rather than globally: the watchdog semantics are
# tuned to the ingest stages' batch cadence, and contract/bench sessions
# shouldn't silently change behavior mid-round.
INGEST_WORKER_WATCHDOG_CONF: dict[str, str] = {
    "spark.python.worker.idleTimeoutSeconds": "600",
    "spark.python.worker.killOnIdleTimeout": "true",
    "spark.python.worker.faulthandler.enabled": "true",
    "spark.python.daemon.killWorkerOnFlushFailure": "true",
}

# Large-state streaming posture (100 TB): the default
# HDFSBackedStateStoreProvider keeps EVERY key's state on the executor
# JVM heap — at billions of (user, window) keys that is an OOM wall, not
# a tuning problem.  The RocksDB provider keeps working state off-heap /
# on local disk with block-cache reads, and changelog checkpointing
# ships only each batch's delta to the checkpoint location instead of
# re-uploading full SST snapshots.  Results are provider-independent
# (pinned by test_streaming's RocksDB parity test); the conf is
# runtime-settable, so callers flip it per large-state query rather
# than session-wide.
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled": "true",
}


def build_session(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes the cluster master / relies on spark-submit.
    """
    cores = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Dynamic-partition parquet writes (fact_ratings partitionBy year)
        # default to a per-task SORT on the partition columns
        # (maxConcurrentOutputFileWriters=0) — at 200M rows that sort is
        # the single-JVM spill wall (COVERAGE.md r8 bonus table: fact
        # stage 30s -> 215s from 100M -> 200M).  The fact table has <=10
        # distinct years, so a handful of concurrent writers per task
        # removes the sort outright; Spark still falls back to sorted
        # spill if a task ever sees more partitions than this.
        .config("spark.sql.maxConcurrentOutputFileWriters", "16")
        # InferFiltersFromGenerate bolts size(child)>0 onto every plain
        # explode().  When the generator child is a DERIVED array (this
        # engine's dominant explode shape: shingles(tokens(text)),
        # word_ngrams, hashed-feature transforms), that inferred filter
        # duplicates the whole interpreted expression tree once per
        # input row — and predicate pushdown then sinks it below the
        # ensure_parallelism exchange onto the unsplit scan, running it
        # single-task (measured on doc_dsir_weights: count pass 7.8s vs
        # 1.3s at sf0.1).  The rule's only benefit — pre-pruning rows
        # whose arrays are empty — is negligible here because explode
        # drops them anyway and our generates sit directly over scans.
        # Hot operators additionally use explode_outer (which the rule
        # skips) so they stay fast under vanilla sessions too.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

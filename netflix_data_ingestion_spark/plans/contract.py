"""Driver-contract queries: reference query shapes over the testdata tables.

Each entry maps one operator/query shape from SURVEY.md §2 (the reference's
declared query surface, schema.sql:131-237 / README.md:450-474, plus its
pipeline aggregates) onto the driver-generated TPC-H-ish tables
(TESTDATA.md), per the FIXTURES.md §B mapping.  Every query has:

- ``spark``:  (spark, sf_dir) -> DataFrame — idiomatic DataFrame API
- ``oracle``: equivalent ANSI SQL for DuckDB over the same parquet

Cross-engine parity discipline:
- every computed column is aliased identically on both sides;
- aggregate doubles are rounded (2 decimals for money-ish, 6 for ratios)
  so independent float summation orders can't flip the value hash;
- LIMIT/top-k queries carry a deterministic tie-break key;
- ints that differ by default width across engines (year(), datediff())
  are cast explicitly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.functions.datetime import (
    date_key,
    day_of_week_monday0,
    is_weekend,
    month_name,
)
from netflix_data_ingestion_spark.operators.ffill import forward_fill_grouped
from netflix_data_ingestion_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q: pricing_summary — flagship (scan + filter + groupBy multi-agg + sort).
# Shape of the reference's daily/summary aggregation views
# (schema.sql:131-144) and the classic pricing-summary report.
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias(
                "avg_price"
            ),
            (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                              AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)      AS sum_disc_price,
       ROUND(SUM(l_quantity), 2) / COUNT(*)                   AS avg_qty,
       ROUND(SUM(l_extendedprice), 2) / COUNT(*)              AS avg_price,
       ROUND(SUM(l_discount), 2) / COUNT(*)                   AS avg_disc,
       COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q: top_parts_by_count — "top-10 most-rated movies" analog
# (README.md:450-454): fact ⋈ dim, groupBy, count+avg, orderBy desc, limit.
# ---------------------------------------------------------------------------


def q_top_parts_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.count("*").alias("order_count"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
        )
        .orderBy(F.col("order_count").desc(), F.col("p_partkey").asc())
        .limit(10)
    )


ORACLE_TOP_PARTS = """
SELECT p_partkey, p_name,
       COUNT(*)                         AS order_count,
       ROUND(SUM(l_extendedprice), 2) / COUNT(*)   AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY order_count DESC, p_partkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q: top_discounted_parts_having — "top-10 highest-rated with HAVING >= K"
# analog (schema.sql:198-210): group, HAVING count filter, order by avg.
# ---------------------------------------------------------------------------


def q_top_discounted_parts_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.count("*").alias("order_count"),
            (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_discount"),
        )
        .filter(F.col("order_count") >= 5)
        .orderBy(F.col("avg_discount").desc(), F.col("p_partkey").asc())
        .limit(10)
    )


ORACLE_TOP_DISCOUNTED_HAVING = """
SELECT p_partkey, p_name,
       COUNT(*)                    AS order_count,
       ROUND(SUM(l_discount), 2) / COUNT(*)   AS avg_discount
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
HAVING COUNT(*) >= 5
ORDER BY avg_discount DESC, p_partkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q: orders_trend_by_year — "rating trend by year" analog (schema.sql:214-224):
# groupBy year, count, avg, count-distinct.
# ---------------------------------------------------------------------------


def q_orders_trend_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("order_count"),
            (F.round(F.sum("o_totalprice"), 2) / F.count("*")).alias("avg_total"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
        .orderBy("order_year")
    )


ORACLE_ORDERS_TREND = """
SELECT CAST(year(o_orderdate) AS INT)   AS order_year,
       COUNT(*)                         AS order_count,
       ROUND(SUM(o_totalprice), 2) / COUNT(*) AS avg_total,
       COUNT(DISTINCT o_custkey)        AS unique_customers
FROM orders
GROUP BY 1
ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# Q: daily_event_summary — v_daily_rating_summary analog (schema.sql:131-144):
# groupBy date, count, avg, two count-distincts, orderBy date.
# ---------------------------------------------------------------------------


def q_daily_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("event_count"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.countDistinct("user_id").alias("unique_users"),
            F.countDistinct("event_type").alias("unique_types"),
        )
        .orderBy("event_date")
    )


ORACLE_DAILY_EVENTS = """
SELECT CAST(ts AS DATE)              AS event_date,
       COUNT(*)                      AS event_count,
       ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
       COUNT(DISTINCT user_id)       AS unique_users,
       COUNT(DISTINCT event_type)    AS unique_types
FROM events
GROUP BY 1
ORDER BY event_date
"""


# ---------------------------------------------------------------------------
# Q: most_active_customers — "most active customers" analog
# (schema.sql:229-237): top-20 by activity + date arithmetic (datediff).
# ---------------------------------------------------------------------------


def q_most_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("order_count"),
            F.min(F.to_date("o_orderdate")).alias("first_order_date"),
            F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        )
        .withColumn(
            "active_days",
            F.datediff("last_order_date", "first_order_date").cast("int"),
        )
        .orderBy(F.col("order_count").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_MOST_ACTIVE = """
SELECT c_custkey, c_name,
       COUNT(*)                                           AS order_count,
       MIN(CAST(o_orderdate AS DATE))                     AS first_order_date,
       MAX(CAST(o_orderdate AS DATE))                     AS last_order_date,
       CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                      MAX(CAST(o_orderdate AS DATE))) AS INT) AS active_days
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY order_count DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q: customer_order_aggregates — the pipeline's customer back-fill aggregate
# (etl_pipeline_spark.py:1388-1396): groupBy key, min/max date, count.
# ---------------------------------------------------------------------------


def q_customer_order_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_order_date"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.count("*").alias("total_orders"),
    )


ORACLE_CUSTOMER_AGGREGATES = """
SELECT o_custkey,
       MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
       MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
       COUNT(*)                       AS total_orders
FROM orders
GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# Q: orphan_lineitems — anti-join integrity check (schema.sql:188-191).
# ---------------------------------------------------------------------------


def q_orphan_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    orphans = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    )
    return orphans.agg(F.count("*").alias("orphan_count"))


ORACLE_ORPHANS = """
SELECT COUNT(*) AS orphan_count
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
"""


# ---------------------------------------------------------------------------
# Q: distinct_event_users — union + distinct dedup across inputs
# (etl_pipeline_spark.py:988-994).
# ---------------------------------------------------------------------------


def q_distinct_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    a = events.filter(F.col("event_type").isin("click", "view")).select("user_id")
    b = events.filter(F.col("event_type").isin("purchase", "signup")).select(
        "user_id"
    )
    return a.union(b).distinct().orderBy("user_id")


ORACLE_DISTINCT_USERS = """
SELECT DISTINCT user_id FROM (
  SELECT user_id FROM events WHERE event_type IN ('click', 'view')
  UNION ALL
  SELECT user_id FROM events WHERE event_type IN ('purchase', 'signup')
) u
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q: calendar_dim — the date-dimension generator (etl_pipeline_spark.py:757-811)
# over the orders date range, with every derived column per the documented
# contract (day_of_week 0=Monday, full month names, weekend flag).
# ---------------------------------------------------------------------------


def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    dates = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("date_actual")
    )
    d = F.col("date_actual")
    return dates.select(
        date_key(d).alias("date_key"),
        d.alias("date_actual"),
        F.year(d).cast("int").alias("year"),
        F.month(d).cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
        F.quarter(d).cast("int").alias("quarter"),
        day_of_week_monday0(d).cast("int").alias("day_of_week"),
        month_name(d).alias("month_name"),
        is_weekend(d).alias("is_weekend"),
    ).orderBy("date_key")


ORACLE_CALENDAR = """
WITH r AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
),
d AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
           AS date_actual
  FROM r
)
SELECT CAST(strftime(date_actual, '%Y%m%d') AS INT)  AS date_key,
       date_actual,
       CAST(year(date_actual) AS INT)                AS year,
       CAST(month(date_actual) AS INT)               AS month,
       CAST(day(date_actual) AS INT)                 AS day,
       CAST(quarter(date_actual) AS INT)             AS quarter,
       CAST(isodow(date_actual) - 1 AS INT)          AS day_of_week,
       monthname(date_actual)                        AS month_name,
       isodow(date_actual) >= 6                      AS is_weekend
FROM d
ORDER BY date_key
"""


# ---------------------------------------------------------------------------
# Q: forward_fill_events — the reference's LOCF primitive
# (etl_pipeline_spark.py:1114-1122) as a grouped forward-fill: carry the
# last purchase amount forward along each user's event timeline.
# ---------------------------------------------------------------------------


def q_forward_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    tagged = events.withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    filled = forward_fill_grouped(
        tagged,
        partition_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="purchase_value",
        out_col="last_purchase_value",
    )
    return filled.select(
        "event_id",
        "user_id",
        F.round("last_purchase_value", 2).alias("last_purchase_value"),
    ).orderBy("event_id")


ORACLE_FORWARD_FILL = """
SELECT event_id, user_id,
       ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS last_purchase_value
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Q: join_drop_accounting — broadcast key-mapping joins with dropped-row
# accounting (etl_pipeline_spark.py:1149-1172).
# ---------------------------------------------------------------------------


def q_join_drop_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey")
    joined = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "left"
    ).join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left")
    return joined.agg(
        F.count("*").alias("total_rows"),
        F.count("p_partkey").alias("with_part"),
        F.count("s_suppkey").alias("with_supplier"),
        F.sum(
            (
                F.col("p_partkey").isNull() | F.col("s_suppkey").isNull()
            ).cast("bigint")
        ).alias("dropped_rows"),
    )


ORACLE_JOIN_DROP = """
SELECT COUNT(*)            AS total_rows,
       COUNT(p_partkey)    AS with_part,
       COUNT(s_suppkey)    AS with_supplier,
       CAST(SUM(CASE WHEN p_partkey IS NULL OR s_suppkey IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_rows
FROM lineitem
LEFT JOIN part     ON l_partkey = p_partkey
LEFT JOIN supplier ON l_suppkey = s_suppkey
"""


# ---------------------------------------------------------------------------
# Q: table_counts — row-count verification via UNION ALL (schema.sql:179-185).
# ---------------------------------------------------------------------------

_COUNT_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")


def q_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = [
        _t(spark, sf_dir, name).agg(
            F.lit(name).alias("table_name"), F.count("*").alias("row_count")
        )
        for name in _COUNT_TABLES
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name")


ORACLE_TABLE_COUNTS = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS table_name, COUNT(*) AS row_count FROM {name}"
    for name in _COUNT_TABLES
) + "\nORDER BY table_name"


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

from netflix_data_ingestion_spark.plans.contract_extra import REGISTRY_EXTRA
from netflix_data_ingestion_spark.plans.contract_llm import REGISTRY_LLM
from netflix_data_ingestion_spark.plans.contract_window import REGISTRY_WINDOW

#: name -> (spark builder, duckdb oracle SQL or None for rows-only checks)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    "pricing_summary": (q_pricing_summary, ORACLE_PRICING_SUMMARY),
    "top_parts_by_count": (q_top_parts_by_count, ORACLE_TOP_PARTS),
    "top_discounted_parts_having": (
        q_top_discounted_parts_having,
        ORACLE_TOP_DISCOUNTED_HAVING,
    ),
    "orders_trend_by_year": (q_orders_trend_by_year, ORACLE_ORDERS_TREND),
    "daily_event_summary": (q_daily_event_summary, ORACLE_DAILY_EVENTS),
    "most_active_customers": (q_most_active_customers, ORACLE_MOST_ACTIVE),
    "customer_order_aggregates": (
        q_customer_order_aggregates,
        ORACLE_CUSTOMER_AGGREGATES,
    ),
    "orphan_lineitems": (q_orphan_lineitems, ORACLE_ORPHANS),
    "distinct_event_users": (q_distinct_event_users, ORACLE_DISTINCT_USERS),
    "calendar_dim": (q_calendar_dim, ORACLE_CALENDAR),
    "forward_fill_events": (q_forward_fill_events, ORACLE_FORWARD_FILL),
    "join_drop_accounting": (q_join_drop_accounting, ORACLE_JOIN_DROP),
    "table_counts": (q_table_counts, ORACLE_TABLE_COUNTS),
    **REGISTRY_LLM,
    **REGISTRY_WINDOW,
    **REGISTRY_EXTRA,
}

# ---------------------------------------------------------------------------
# Verification-window rotation.
#
# The external correctness harness samples the FIRST 50 registry entries each
# round.  With >50 registered queries, whatever sits past position 50 never
# receives an oracle row.  We therefore rotate: queries that have not yet been
# harness-verified (or were last verified longest ago) are moved to the head,
# and the most-recently-verified block to the tail.  The registry CONTENT is
# unchanged — this is a pure reordering.
#
# Current rotation (round 4): the 3 never-verified queries first, then the 19
# queries last verified in round 2, then queries new this round (both
# sessions — 47 entries total, so positions 48-50 re-verify the head of the
# round-3-green block), then the rest of the round-3-verified block.
# ---------------------------------------------------------------------------

_VERIFY_FIRST: list[str] = [
    # never harness-verified
    "user_state_history",
    "user_funnel",
    "customer_merge_upsert",
    # last verified in round 2
    "events_asof_view_attribution",
    "error_context_range_join",
    "part_revenue_rank_in_brand",
    "running_event_total",
    "events_sessionization",
    "pivot_event_types",
    "orders_rollup",
    "approx_distinct_users_daily",
    "regional_revenue",
    "user_event_gaps",
    "customer_balance_quartiles",
    "retained_customers_intersect",
    "orders_cube",
    "lineitem_grouping_sets",
    "customers_with_urgent_orders",
    "lapsed_customers_except",
    "brand_priciest_part",
    "median_order_by_segment",
    "orders_above_customer_avg",
    # new in round 4 (must sit inside the 50-query window)
    "doc_chunk_text",
    "customer_snapshot_diff",
    "weekly_active_users",
    "daily_summary_incremental",
    "brand_quantity_salted",
    "order_price_quantiles",
    "doc_stratified_sample",
    "user_event_cms",
    "events_sliding_window",
    "doc_line_dedup",
    "user_retention_cohorts",
    "lineitem_bloom_semi",
    "order_price_outliers",
    "order_price_equidepth",
    "doc_inverted_index",
    "dedup_semantic",
    "orders_zorder_key",
    "orders_expectations",
    "customer_supplier_pagerank",
    "events_ewma",
    "part_name_fuzzy_pairs",
    "customer_busy_periods",
    "user_hll_registers",
    "order_price_mad_outliers",
    "embedding_l2_normalize",
]

_ROUND5_HEAD: list[str] = [
    # the round-4 red row: the SCD2 sentinel fix (2260-12-31, pandas-safe)
    # must be proven by a fresh driver row, so it leads the window
    "user_state_history",
    # r4's only "err" row: now carries an exact-count + bounded-error
    # boolean oracle instead of rows-only — prove the conversion
    "approx_distinct_users_daily",
    # every query whose CODE changed in round 5 re-enters the window
    # ahead of the never-sampled backlog (the red-row lesson: changed
    # code needs driver proof first) — the distributed-rank rewires
    "customer_balance_quartiles",   # ntile_ranged
    "order_price_equidepth",        # global_rank offsets via prefix sum
    "user_decile_lift",             # ntile_ranged
    "customer_rfm_segments",        # ntile_ranged x3
    "orders_price_drift",           # exact_quantiles_ranged cuts
    "order_price_auc",              # prefix-sum cumulative negatives
    "part_abc_classes",             # prefix-sum cumulative revenue
]

# ---------------------------------------------------------------------------
# ROUND-5 ROTATION PLAN (apply at the START of round 5: replace
# _VERIFY_FIRST with this list).  These are the queries with no driver
# CORRECTNESS row yet — the r4-mid additions (doc_bpe_token_stats,
# doc_pps_sample, user_context_window, events_pit_state,
# doc_chunk_text-era entries already sampled in r4 stay out) and all 39
# r4-late additions.  Locally every one is oracle-green at sf0.01 and
# sf0.1; the rotation only hands them to the external harness.  The list
# now exceeds the 50-query window (r4-continuation additions queue at the
# tail, oldest-unverified-first): entries past 50 roll to the round-6 window.
# ---------------------------------------------------------------------------
_VERIFY_ROUND5: list[str] = [
    "doc_bpe_token_stats",
    "doc_pps_sample",
    "user_context_window",
    "events_pit_state",
    "user_heavy_hitters",
    "events_throttled_daily",
    "customer_part_negatives",
    "doc_class_balance",
    "dedup_containment",
    "ann_pq_topk",
    "events_ohlc_hourly",
    "brand_top_price_levels",
    "orders_join_delta",
    "corpus_bigram_lm",
    "doc_quality_source_cut",
    "corpus_vocab_growth",
    "part_cooccurrence",
    "purchase_view_attribution",
    "embedding_random_projection",
    "part_triangle_counts",
    "part_kcore",
    "user_churn_labels",
    "part_skyline_by_brand",
    "top_session_paths",
    "orders_lineitem_join_size",
    "doc_kfold",
    "doc_token_ids",
    "doc_padded_tokens",
    "embedding_int8_quantize",
    "doc_pack_windows",
    "doc_model_scores",
    "customer_pseudonymized",
    "orders_unpivot",
    "customer_balance_percentile",
    "user_hll_by_type",
    "order_price_winsorized",
    "dedup_exact_canonical",
    "customer_k_anonymous",
    "doc_bm25_search",
    "events_time_split",
    "customer_rfm_segments",
    "lineitem_feature_corr",
    "price_quantity_ols",
    "ann_multiprobe_topk",
    "dedup_simhash_pairs",
    "dedup_lsh_recall",
    "time_to_purchase_labels",
    "user_decile_lift",
    # r4-continuation additions (oldest-unverified-first: these queue last)
    "dedup_prefix_jaccard",
    "customer_supplier_communities",
    "events_seasonal_anomaly",
    "user_forget_audit",
    "part_name_entities",
    "dedup_incremental",
    "doc_dup_spans",
    "doc_span_cut",
    "orders_price_drift",
    "events_burst_collapse",
    "orders_priority_encoding",
    "nation_revenue_share",
    "lineitem_table_digest",
    "part_item_neighbors",
    "events_ab_report",
    "order_price_auc",
    "multimodal_phash_pairs",
    "customer_supplier_hops",
    "order_lifecycle",
    "cohort_ltv",
    "orders_price_standardized",
    "lineitem_salt_advice",
    "kmeans_inertia",
    "order_class_report",
    "events_twap_daily",
    "session_entry_conversion",
    "part_abc_classes",
    "events_cooldown_throttle",
]

# Round-5 window = the fixed red row first, then the never-driver-sampled
# queries oldest-first.  Entries past position 50 queue for round 6.
_VERIFY_ORDER: list[str] = _ROUND5_HEAD + [
    n for n in _VERIFY_ROUND5 if n not in _ROUND5_HEAD
]

REGISTRY = {
    **{name: REGISTRY[name] for name in _VERIFY_ORDER},
    **{
        name: spec
        for name, spec in REGISTRY.items()
        if name not in _VERIFY_ORDER
    },
}

# ---------------------------------------------------------------------------
# ROUND-6 ROTATION PLAN — APPLIED below (registry head =
# _VERIFY_ORDER6).  The 30 queries with no driver CORRECTNESS row after
# the round-5 window, oldest-registered-first, then the oldest
# r1/r2-era greens for re-verification (code unchanged since unless
# noted).  After the round-6 window every pre-r6 registry query has a
# driver row; the round-6 tail additions queue in _VERIFY_ROUND7.
# ---------------------------------------------------------------------------
_VERIFY_ROUND6: list[str] = [
    # never driver-sampled (rolled out of the r5 window)
    "price_quantity_ols",
    "ann_multiprobe_topk",
    "dedup_simhash_pairs",
    "dedup_lsh_recall",
    "time_to_purchase_labels",
    "dedup_prefix_jaccard",
    "customer_supplier_communities",
    "events_seasonal_anomaly",
    "user_forget_audit",
    "part_name_entities",
    "dedup_incremental",
    "doc_dup_spans",
    "doc_span_cut",
    "events_burst_collapse",
    "orders_priority_encoding",
    "nation_revenue_share",
    "lineitem_table_digest",
    "part_item_neighbors",
    "events_ab_report",
    "multimodal_phash_pairs",
    "customer_supplier_hops",
    "order_lifecycle",
    "cohort_ltv",
    "orders_price_standardized",
    "lineitem_salt_advice",
    "kmeans_inertia",
    "order_class_report",
    "events_twap_daily",
    "session_entry_conversion",
    "events_cooldown_throttle",
    # oldest (r1/r2-era) greens, for re-verification in window slots 31-50
    "pricing_summary",
    "top_parts_by_count",
    "top_discounted_parts_having",
    "orders_trend_by_year",
    "daily_event_summary",
    "most_active_customers",
    "customer_order_aggregates",
    "orphan_lineitems",
    "distinct_event_users",
    "calendar_dim",
    "forward_fill_events",
    "join_drop_accounting",
    "table_counts",
    "event_props_json",
    "top_tokens",
    "train_test_split",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
]

# Round-6 window (applied): the two round-5 red rows first (red-row
# convention — both were oracle HUGEINT-representation defects, fixed by
# CAST(... AS BIGINT) in the oracle strings, Spark answers unchanged),
# then the 30 never-driver-sampled queries (which already include the
# two latent HUGEINT carriers nation_revenue_share and
# session_entry_conversion — all four HUGEINT fixes are driver-proven in
# one window), then the oldest r1/r2-era greens.  52 candidates for 50
# slots: the last two (dedup_simhash, ann_lsh_topk) queue for round 7.
_ROUND6_HEAD: list[str] = ["orders_price_drift", "part_abc_classes"]
_VERIFY_ORDER6: list[str] = _ROUND6_HEAD + [
    n for n in _VERIFY_ROUND6 if n not in _ROUND6_HEAD
]

REGISTRY = {
    **{name: REGISTRY[name] for name in _VERIFY_ORDER6},
    **{
        name: spec
        for name, spec in REGISTRY.items()
        if name not in _VERIFY_ORDER6
    },
}

# ---------------------------------------------------------------------------
# ROUND-7 ROTATION PLAN — APPLIED below (registry head =
# _VERIFY_ROUND7).  The two r6-window spillovers first, then the round-6
# additions (registered at the tail last round so the frozen r6 window
# stayed byte-identical to the drafted plan), then the 41 queries whose
# driver CORRECTNESS rows are oldest (latest sampling r3, then r4,
# ordered by registration) for re-verification.  After this window every
# registry query's most recent driver row is r6 or r7.  Notables in the
# re-verification block: `lineitem_skew_report` (rebuilt on global_rank
# in r6 — this samples the NEW code), and `events_gapfill` /
# `events_trailing_hour` (the r6 bench-doubling pair — fresh rows prove
# the results unchanged while COVERAGE.md adjudicates the timing).
# ---------------------------------------------------------------------------
_VERIFY_ROUND7: list[str] = [
    # rolled out of the 50-slot r6 window (positions 51-52)
    "dedup_simhash",
    "ann_lsh_topk",
    # round-6 additions, never driver-sampled
    "corpus_bpe_merges",
    "doc_bpe_segmented",
    "embedding_top_pc",
    "label_hard_negatives",
    "order_price_gk_quantiles",
    "doc_char_augment",
    "doc_token_mask",
    # oldest driver rows (latest sampling r3), registration order
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_near_dup_scale",
    "dedup_embedding_cosine",
    "dedup_cosine_scale",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "doc_token_stats",
    "doc_quality_score",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_tfidf_top_terms",
    "doc_pii_redact",
    "embedding_group_centroid",
    "curate_corpus",
    "kmeans_clusters",
    "doc_repetition_ratio",
    "doc_quota_sample",
    "doc_bernoulli_mix",
    "doc_contamination",
    "doc_pack_chunks",
    "events_tumbling_window",
    "multimodal_meta",
    "multimodal_frame_sample",
    "event_transitions",
    "orders_profile",
    "orders_price_histogram",
    "lineitem_skew_report",
    "events_gapfill",
    "events_trailing_hour",
    # next-oldest (latest sampling r4), registration order
    "doc_line_dedup",
    "embedding_l2_normalize",
    "user_hll_registers",
    "dedup_semantic",
    "doc_inverted_index",
    "doc_chunk_text",
    "doc_stratified_sample",
    "user_event_cms",
    "events_sliding_window",
    "user_retention_cohorts",
    "events_ewma",
]

REGISTRY = {
    **{name: REGISTRY[name] for name in _VERIFY_ROUND7},
    **{
        name: spec
        for name, spec in REGISTRY.items()
        if name not in _VERIFY_ROUND7
    },
}

# ---------------------------------------------------------------------------
# ROUND-8 ROTATION DRAFT (apply at the START of round 8: make this the
# registry head).  The four round-7 tail additions first (registered at
# the tail this round so the frozen r7 window stayed byte-identical to
# the drafted plan; all four bit-exact at sf0.01 AND sf0.1 locally),
# then the remaining latest-sampling-r4 rows, then the oldest r5 rows —
# after this window every registry query's most recent driver row is
# r6, r7 or r8.
# ---------------------------------------------------------------------------
_VERIFY_ROUND8: list[str] = [
    # round-7 additions, never driver-sampled
    "embedding_top_pcs",
    "doc_bpe_encode",
    "embedding_pca_project",
    "doc_lm_perplexity",
    # oldest remaining driver rows (latest sampling r4), registration order
    "weekly_active_users",
    "user_funnel",
    "events_asof_view_attribution",
    "error_context_range_join",
    "part_revenue_rank_in_brand",
    "running_event_total",
    "events_sessionization",
    "pivot_event_types",
    "orders_rollup",
    "order_price_mad_outliers",
    "customer_busy_periods",
    "part_name_fuzzy_pairs",
    "customer_supplier_pagerank",
    "orders_expectations",
    "orders_zorder_key",
    "order_price_outliers",
    "lineitem_bloom_semi",
    "customer_merge_upsert",
    "customer_snapshot_diff",
    "daily_summary_incremental",
    "brand_quantity_salted",
    "order_price_quantiles",
    "regional_revenue",
    "user_event_gaps",
    "retained_customers_intersect",
    "orders_cube",
    "lineitem_grouping_sets",
    "customers_with_urgent_orders",
    "lapsed_customers_except",
    "brand_priciest_part",
    "median_order_by_segment",
    "orders_above_customer_avg",
    # next-oldest (latest sampling r5), registration order
    "user_state_history",
    "approx_distinct_users_daily",
    "customer_balance_quartiles",
    "order_price_equidepth",
    "user_decile_lift",
    "customer_rfm_segments",
    "order_price_auc",
    "doc_bpe_token_stats",
    "doc_pps_sample",
    "user_context_window",
    "events_pit_state",
    "user_heavy_hitters",
    "events_throttled_daily",
    "customer_part_negatives",
]

# ---------------------------------------------------------------------------
# ROUND-9 ROTATION (drafted in round 8, APPLIED at the start of round 9).
# The eight round-8 tail additions first (registered at the tail in round 8
# so the frozen r8 window stayed byte-identical to the drafted plan; all
# eight oracle-checked at sf0.01 AND sf0.1 locally and independently
# re-verified by the round-8 judge), then the oldest remaining driver rows
# (latest sampling r5, then r6, in registration order) — after this window
# every registry query's most recent driver row is r7, r8 or r9.
# ---------------------------------------------------------------------------
_VERIFY_ROUND9: list[str] = [
    # round-8 additions, never driver-sampled
    "ann_ivf_recall",
    "ann_pq_recall",
    "ann_lsh_recall",
    "ann_multiprobe_recall",
    "multimodal_audio_stats",
    "multimodal_gif_frames",
    "multimodal_audio_resample",
    "multimodal_avi_frames",
    # oldest remaining driver rows (latest sampling r5), registration order
    "doc_class_balance",
    "dedup_containment",
    "ann_pq_topk",
    "events_ohlc_hourly",
    "brand_top_price_levels",
    "orders_join_delta",
    "corpus_bigram_lm",
    "doc_quality_source_cut",
    "corpus_vocab_growth",
    "part_cooccurrence",
    "purchase_view_attribution",
    "embedding_random_projection",
    "part_triangle_counts",
    "part_kcore",
    "user_churn_labels",
    "part_skyline_by_brand",
    "top_session_paths",
    "orders_lineitem_join_size",
    "doc_kfold",
    "doc_token_ids",
    "doc_padded_tokens",
    "embedding_int8_quantize",
    "doc_pack_windows",
    "doc_model_scores",
    "customer_pseudonymized",
    "orders_unpivot",
    "customer_balance_percentile",
    "user_hll_by_type",
    "order_price_winsorized",
    "dedup_exact_canonical",
    "customer_k_anonymous",
    "doc_bm25_search",
    "events_time_split",
    "lineitem_feature_corr",
    "orders_price_drift",
    "part_abc_classes",
    "price_quantity_ols",
    "ann_multiprobe_topk",
    # next-oldest (latest sampling r6), registration order
    "dedup_simhash_pairs",
    "dedup_lsh_recall",
    "time_to_purchase_labels",
    "dedup_prefix_jaccard",
]

# ---------------------------------------------------------------------------
# Round-10 head window (was the applied rotation in round 10; superseded by
# the round-11 rotation below — kept for the audit trail).  The driver
# samples the first 50 registry names each round (round-7 lesson:
# tests/test_entry_contract.py must pin the head via _APPLIED_ROTATION, not
# a round-named list, so the assertion can't go stale).
#
# Round-10 head window (drafted in round 8/9, applied at round-10 start).
# The eight round-9 tail additions first (registered at the tail in r9 so
# the frozen r9 window stayed byte-identical to the r8-drafted plan; ALL
# EIGHT oracle-checked at sf0.01 AND sf0.1 locally at add time AND
# independently re-verified at both SFs by the r9 judge), then the oldest
# remaining driver rows (latest sampling r6) in registry order, computed
# from CORRECTNESS_r01..r09 — after this window every registry query's
# latest driver row is r7, r8, r9 or r10 (the handful of remaining r7
# rows rotate in round 11).
# ---------------------------------------------------------------------------
_VERIFY_ROUND10: list[str] = [
    # round-9 additions, never driver-sampled
    "multimodal_mp4_frames",
    "events_asof_next_view",
    "events_asof_nearest_view",
    "doc_source_mixture",
    "doc_mixture_realized",
    "doc_fim_transform",
    "doc_span_corrupt",
    "doc_length_batches",
    # oldest remaining driver rows (latest sampling r6), registry order
    "customer_supplier_communities",
    "events_seasonal_anomaly",
    "user_forget_audit",
    "part_name_entities",
    "dedup_incremental",
    "doc_dup_spans",
    "doc_span_cut",
    "events_burst_collapse",
    "orders_priority_encoding",
    "nation_revenue_share",
    "lineitem_table_digest",
    "part_item_neighbors",
    "events_ab_report",
    "multimodal_phash_pairs",
    "customer_supplier_hops",
    "order_lifecycle",
    "cohort_ltv",
    "orders_price_standardized",
    "lineitem_salt_advice",
    "kmeans_inertia",
    "order_class_report",
    "events_twap_daily",
    "session_entry_conversion",
    "events_cooldown_throttle",
    "pricing_summary",
    "top_parts_by_count",
    "top_discounted_parts_having",
    "orders_trend_by_year",
    "daily_event_summary",
    "most_active_customers",
    "customer_order_aggregates",
    "orphan_lineitems",
    "distinct_event_users",
    "calendar_dim",
    "forward_fill_events",
    "join_drop_accounting",
    "table_counts",
    "event_props_json",
    "top_tokens",
    "train_test_split",
    "dedup_exact",
    "dedup_minhash_lsh",
]

# ---------------------------------------------------------------------------
# Round-11 rotation APPLIED (drafted in round 10).  The six round-10 tail
# additions first (registered at the tail in r10 so the frozen r10 window
# stayed byte-identical to the r9-drafted plan; ALL SIX oracle-checked at
# sf0.01 AND sf0.1 locally at add time AND independently re-verified at both
# SFs by the r10 judge), then the oldest remaining driver rows (latest
# sampling r7) in registry order, computed from CORRECTNESS_r01..r09 + the
# applied r10 window.  NOTE (r10 advice, corrected against the full
# CORRECTNESS_r01..r10 history at r11 start): 50 r7-era rows remained but
# the window holds 50 − 6 = 44, so SIX r7-era queries slip to round 12
# (doc_chunk_text, doc_stratified_sample, user_event_cms,
# events_sliding_window, user_retention_cohorts, events_ewma) — they lead
# _VERIFY_ROUND12 below.  After this window every registry query's latest
# driver row is r8–r11 EXCEPT those six (still r7).
# ---------------------------------------------------------------------------
_VERIFY_ROUND11: list[str] = [
    # round-10 additions, never driver-sampled
    "ann_ivf_topk_staged",
    "ann_pq_topk_staged",
    "events_throttled_daily_stream",
    "multimodal_jpeg_progressive",
    "doc_dsir_weights",
    "doc_dsir_resample",
    # oldest remaining driver rows (latest sampling r7), registry order
    "dedup_simhash",
    "ann_lsh_topk",
    "corpus_bpe_merges",
    "doc_bpe_segmented",
    "embedding_top_pc",
    "label_hard_negatives",
    "order_price_gk_quantiles",
    "doc_char_augment",
    "doc_token_mask",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_near_dup_scale",
    "dedup_embedding_cosine",
    "dedup_cosine_scale",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "doc_token_stats",
    "doc_quality_score",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_tfidf_top_terms",
    "doc_pii_redact",
    "embedding_group_centroid",
    "curate_corpus",
    "kmeans_clusters",
    "doc_repetition_ratio",
    "doc_quota_sample",
    "doc_bernoulli_mix",
    "doc_contamination",
    "doc_pack_chunks",
    "events_tumbling_window",
    "multimodal_meta",
    "multimodal_frame_sample",
    "event_transitions",
    "orders_profile",
    "orders_price_histogram",
    "lineitem_skew_report",
    "events_gapfill",
    "events_trailing_hour",
    "doc_line_dedup",
    "embedding_l2_normalize",
    "user_hll_registers",
    "dedup_semantic",
    "doc_inverted_index",
]

_VERIFY_ROUND11_APPLIED = _VERIFY_ROUND11  # kept for history/audit

# ---------------------------------------------------------------------------
# Round-12 rotation APPLIED (drafted in round 11).  The round-11 tail
# additions first (registered at the tail in r11 so the frozen r11 window
# stayed byte-identical to the r10-drafted plan; BOTH oracle-checked at
# sf0.01 AND sf0.1 locally at add time AND independently re-verified at
# both SFs by the r11 judge), then the six r7-era rows that slipped out of
# the r11 window, then the oldest remaining r8-era rows in registry order
# (computed from CORRECTNESS_r01..r11) to fill the 50-name window.
# ---------------------------------------------------------------------------
_VERIFY_ROUND12: list[str] = [
    # round-11 additions, never driver-sampled
    "events_tumbling_window_stream",
    "multimodal_jpeg_12bit",
    "events_sliding_window_stream",
    "multimodal_jpeg_lossless",
    "multimodal_jpeg_prog12",
    # r7-era rows that slipped out of the r11 window
    "doc_chunk_text",
    "doc_stratified_sample",
    "user_event_cms",
    "events_sliding_window",
    "user_retention_cohorts",
    "events_ewma",
    # oldest remaining driver rows (latest sampling r8), registry order
    "user_state_history",
    "approx_distinct_users_daily",
    "customer_balance_quartiles",
    "order_price_equidepth",
    "user_decile_lift",
    "customer_rfm_segments",
    "order_price_auc",
    "doc_bpe_token_stats",
    "doc_pps_sample",
    "user_context_window",
    "events_pit_state",
    "user_heavy_hitters",
    "events_throttled_daily",
    "customer_part_negatives",
    "embedding_top_pcs",
    "doc_bpe_encode",
    "embedding_pca_project",
    "doc_lm_perplexity",
    "weekly_active_users",
    "user_funnel",
    "events_asof_view_attribution",
    "error_context_range_join",
    "part_revenue_rank_in_brand",
    "running_event_total",
    "events_sessionization",
    "pivot_event_types",
    "orders_rollup",
    "order_price_mad_outliers",
    "customer_busy_periods",
    "part_name_fuzzy_pairs",
    "customer_supplier_pagerank",
    "orders_expectations",
    "orders_zorder_key",
    "order_price_outliers",
    "lineitem_bloom_semi",
    "customer_merge_upsert",
    "customer_snapshot_diff",
    "daily_summary_incremental",
    "brand_quantity_salted",
]

# ---------------------------------------------------------------------------
# ROUND-13 ROTATION DRAFT (apply at the START of round 13: rebind
# _APPLIED_ROTATION to this list).  The nine round-12 tail additions
# first (registered at the tail this round so the frozen r12 window
# stayed byte-identical to the r11-drafted plan; ALL NINE
# oracle-checked at sf0.01 AND sf0.1 locally at add time), then the
# oldest remaining driver rows (latest sampling r8, then r9) in
# registry order, computed from CORRECTNESS_r01..r11 + the applied r12
# window.  Any further round-12 tail additions must be inserted at the
# head at round-13 start.
# ---------------------------------------------------------------------------
_VERIFY_ROUND13: list[str] = [
    # round-12 additions, never driver-sampled
    "events_session_window_stream",
    "orders_cdc_snapshot_stream",
    "events_ohlc_hourly_stream",
    "ratings_dead_letters",
    "calendar_check_report",
    "corpus_unigram_vocab",
    "doc_unigram_segmented",
    "doc_unigram_encode",
    "events_error_clicks_stream",
    # oldest remaining driver rows (latest sampling r8), registry order
    "order_price_quantiles",
    "regional_revenue",
    "user_event_gaps",
    "retained_customers_intersect",
    "orders_cube",
    "lineitem_grouping_sets",
    "customers_with_urgent_orders",
    "lapsed_customers_except",
    "brand_priciest_part",
    "median_order_by_segment",
    "orders_above_customer_avg",
    # then the oldest r9-era rows, registry order
    "orders_price_drift",
    "part_abc_classes",
    "price_quantity_ols",
    "ann_multiprobe_topk",
    "dedup_simhash_pairs",
    "dedup_lsh_recall",
    "time_to_purchase_labels",
    "dedup_prefix_jaccard",
    "doc_class_balance",
    "dedup_containment",
    "ann_pq_topk",
    "events_ohlc_hourly",
    "brand_top_price_levels",
    "orders_join_delta",
    "corpus_bigram_lm",
    "doc_quality_source_cut",
    "corpus_vocab_growth",
    "part_cooccurrence",
    "purchase_view_attribution",
    "embedding_random_projection",
    "part_triangle_counts",
    "part_kcore",
    "user_churn_labels",
    "part_skyline_by_brand",
    "top_session_paths",
    "orders_lineitem_join_size",
    "doc_kfold",
    "doc_token_ids",
    "doc_padded_tokens",
    "embedding_int8_quantize",
]

# _APPLIED_ROTATION is the single source of truth for "which window is the
# current registry head" — tests assert the head against THIS name so the
# assertion can never go stale when a future round advances the window.
_APPLIED_ROTATION = _VERIFY_ROUND12

REGISTRY = {
    **{name: REGISTRY[name] for name in _APPLIED_ROTATION},
    **{
        name: spec
        for name, spec in REGISTRY.items()
        if name not in _APPLIED_ROTATION
    },
}

"""Driver-contract queries: window/multi-dim operators beyond the flat
reference surface (the reference's declared query layer stops at
group-by/order-by/limit SQL, /root/reference/schema.sql:131-237) — ranking windows, running totals, sessionization
(the batch twin of streaming/ingest.session_windows), pivot, rollup,
and approximate count-distinct (rows-only: HLL sketches are not
engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import (
    funnel,
    gapfill,
    profile,
    rolling,
    scd,
    transitions,
)
from netflix_data_ingestion_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Ranking window: revenue rank of parts within brand
# ---------------------------------------------------------------------------


def q_part_revenue_rank_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("brand_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("brand_rank") <= 3)
        .orderBy("p_brand", "brand_rank")
    )


ORACLE_BRAND_RANK = """
WITH per_part AS (
  SELECT p_brand, p_partkey, ROUND(SUM(l_extendedprice), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand, p_partkey, revenue,
       CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                               ORDER BY revenue DESC, p_partkey ASC) AS INT)
         AS brand_rank
FROM per_part
QUALIFY brand_rank <= 3
ORDER BY p_brand, brand_rank
"""


# ---------------------------------------------------------------------------
# Running total: cumulative daily event counts
# ---------------------------------------------------------------------------


def q_running_event_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("event_count")
    )
    w = (
        Window.orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_date",
        "event_count",
        F.sum("event_count").over(w).alias("running_total"),
    ).orderBy("event_date")


ORACLE_RUNNING_TOTAL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS event_count
  FROM events GROUP BY 1
)
SELECT event_date, event_count,
       CAST(SUM(event_count) OVER (ORDER BY event_date
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
         AS running_total
FROM daily
ORDER BY event_date
"""


# ---------------------------------------------------------------------------
# Sessionization (batch twin of streaming session_window): 30-minute gap
# ---------------------------------------------------------------------------


def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("events_in_session"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "events_in_session",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


# gaps-and-islands: a new session starts when the gap from the previous
# event reaches 30 minutes; session_start = min(ts) of the island.
# ">=" matches Spark's half-open session_window merge rule: events merge
# only while next_ts < prev_ts + gap, so a gap of exactly 30 minutes
# starts a NEW session in both engines.
ORACLE_SESSIONIZATION = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS events_in_session,
       ROUND(SUM(value), 2) AS session_value
FROM islands
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# Pivot: daily event counts by type as columns
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    out = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .orderBy("event_date")
    )
    # pivot yields NULL for absent combos; normalize to 0 for parity
    return out.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


ORACLE_PIVOT = """
SELECT CAST(ts AS DATE) AS event_date,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error
FROM events
GROUP BY 1
ORDER BY event_date
"""


# ---------------------------------------------------------------------------
# Rollup: order totals by (year, month) with subtotals and grand total
# ---------------------------------------------------------------------------


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        "o_totalprice",
    )
    return (
        base.rollup("order_year", "order_month")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("order_month").asc_nulls_first(),
        )
    )


ORACLE_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INT)  AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       COUNT(*) AS order_count,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (1, 2)
ORDER BY order_year ASC NULLS FIRST, order_month ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Approximate count-distinct (HLL) — bounded-error contract: the sketch
# value itself is not portable across engines, but its ERROR BOUND is a
# checkable fact.  The row carries the exact distinct count (oracle-
# reproducible) plus a boolean asserting the native HLL estimate landed
# within 3x its configured rsd (0.05 -> 15%); the oracle emits TRUE, so
# an out-of-tolerance sketch becomes a hash mismatch, not a shrug.
# Spark's HLL++ is deterministic for given data, so the row cannot flake.
# ---------------------------------------------------------------------------


def q_approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    per_day = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.approx_count_distinct("user_id", 0.05).alias("__approx"),
        F.count_distinct("user_id").cast("long").alias("exact_users"),
    )
    # integer arithmetic: |approx - exact| * 100 <= exact * 15
    return per_day.select(
        "event_date",
        "exact_users",
        (
            F.abs(F.col("__approx") - F.col("exact_users")) * 100
            <= F.col("exact_users") * 15
        ).alias("approx_within_15pct"),
    ).orderBy("event_date")


ORACLE_APPROX_DISTINCT_DAILY = """
SELECT CAST(ts AS DATE) AS event_date,
       COUNT(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS approx_within_15pct
FROM events
WHERE ts IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_events_asof_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's most recent prior (or
    simultaneous) view — the canonical as-of join."""
    from netflix_data_ingestion_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        views,
        on="ts",
        by=("user_id",),
        right_cols=("event_id", "value"),
        prefix="view_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_event_id"),
        F.col("view_value"),
    ).orderBy("event_id")


ORACLE_ASOF = """
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS view_event_id, r.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def q_events_asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's EARLIEST subsequent (or
    simultaneous) view — the forward as-of direction (r9: closes the
    operator's last honest NotImplementedError gate; 'what did the user
    see right after clicking' is the post-hoc attribution shape).
    Deterministic: (user_id, ts) is unique among views at every shipped
    SF (checked), the operator's documented precondition."""
    from netflix_data_ingestion_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        views,
        on="ts",
        by=("user_id",),
        right_cols=("event_id", "value"),
        prefix="view_",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_event_id"),
        F.col("view_value"),
    ).orderBy("event_id")


# DuckDB's ASOF JOIN takes the direction from the inequality: <= is
# the forward (earliest-subsequent) search
ORACLE_ASOF_FWD = """
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS view_event_id, r.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
ORDER BY l.event_id
"""


def q_events_asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's CLOSEST view in absolute
    time, backward winning exact-distance ties (pandas merge_asof
    parity, property-proven in tests/test_asof.py) — the nearest as-of
    direction.  The oracle brute-forces every (click, view) pair per
    user and ranks; the operator computes both directional matches in
    one shuffle and picks by distance."""
    from netflix_data_ingestion_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        views,
        on="ts",
        by=("user_id",),
        right_cols=("event_id", "value"),
        prefix="view_",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_event_id"),
        F.col("view_value"),
    ).orderBy("event_id")


ORACLE_ASOF_NEAREST = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'),
ranked AS (
  SELECT c.event_id, v.event_id AS view_event_id, v.value AS view_value,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(epoch(c.ts) - epoch(v.ts)),
                    CASE WHEN v.ts <= c.ts THEN 0 ELSE 1 END
         ) AS rn
  FROM c JOIN v ON v.user_id = c.user_id
)
SELECT c.event_id, c.user_id, c.ts, r.view_event_id, r.view_value
FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (event_id)
ORDER BY c.event_id
"""


def q_error_context_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many other same-user events occurred in the
    5 minutes leading up to it (bucketed range join, not nested-loop)."""
    from netflix_data_ingestion_spark.operators.rangejoin import (
        range_join_bucketed,
    )

    events = _t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    points = events.select("event_id", "user_id", "ts")
    paired = range_join_bucketed(
        points, errors, "ts", "start_ts", "end_ts", ("user_id",), 300
    ).filter(F.col("event_id") != F.col("error_event_id"))
    counts = paired.groupBy("error_event_id", "user_id").agg(
        F.count("*").alias("n_context_events")
    )
    return (
        errors.select("error_event_id", "user_id")
        .join(counts, ["error_event_id", "user_id"], "left")
        .select(
            "error_event_id",
            "user_id",
            F.coalesce("n_context_events", F.lit(0)).alias("n_context_events"),
        )
        .orderBy("error_event_id")
    )


ORACLE_RANGE_JOIN = """
WITH err AS (
  SELECT event_id AS error_event_id, user_id,
         ts - INTERVAL 5 MINUTE AS start_ts, ts AS end_ts
  FROM events WHERE event_type = 'error'
),
cnt AS (
  SELECT e.error_event_id, e.user_id, COUNT(*) AS n_context_events
  FROM err e JOIN events p
    ON p.user_id = e.user_id
   AND p.ts BETWEEN e.start_ts AND e.end_ts
   AND p.event_id <> e.error_event_id
  GROUP BY 1, 2
)
SELECT e.error_event_id, e.user_id,
       COALESCE(c.n_context_events, 0) AS n_context_events
FROM err e LEFT JOIN cnt c USING (error_event_id, user_id)
ORDER BY error_event_id
"""


# ---------------------------------------------------------------------------
# Time-bucket rollup with gap filling (hypertable densify + locf)
# ---------------------------------------------------------------------------


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user 6-hour buckets (operators/gapfill.py): zero-filled
    counts, NULL sums in gaps, last-observation-carried-forward value.
    Spark generates the dense spine distributed (sequence+explode inside
    each key row); the oracle uses generate_series — same range,
    same 6-hour epoch alignment (946684800 % 21600 == 0, so DuckDB's
    2000-01-01 origin and Spark's 1970-01-01 origin agree)."""
    events = _t(spark, sf_dir, "events")
    return gapfill.time_bucket_gapfill(
        events, "user_id", "ts", "value", bucket="6 hours"
    ).orderBy("user_id", "bucket_start")


ORACLE_GAPFILL = """
WITH b AS (
  SELECT user_id, time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
),
rng AS (
  SELECT user_id, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
  FROM b GROUP BY 1
),
spine AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket_start
  FROM rng
)
SELECT s.user_id, s.bucket_start,
       COALESCE(b.n_events, 0)::BIGINT AS n_events,
       b.sum_value AS sum_value,
       last_value(b.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM spine s LEFT JOIN b USING (user_id, bucket_start)
ORDER BY s.user_id, s.bucket_start
"""


# ---------------------------------------------------------------------------
# Trailing event-time range window (per-event "activity in the last hour")
# ---------------------------------------------------------------------------


def q_events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour stats (operators/rolling.py): RANGE frame
    over event-time micros, fixed-point int64 sum inside the frame."""
    events = _t(spark, sf_dir, "events")
    return (
        rolling.trailing_range_stats(
            events.select("event_id", "ts", "user_id", "value"),
            "user_id",
            "ts",
            "value",
            window_seconds=3600,
        )
        .select(
            "event_id", "user_id", "n_trailing", "sum_value_trailing"
        )
        .orderBy("event_id")
    )


ORACLE_TRAILING_HOUR = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing,
       (SUM(ROUND(value * 100)::BIGINT) OVER w)::DOUBLE / 100.0
         AS sum_value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# SCD Type-2 history (dimension time travel from a change log)
# ---------------------------------------------------------------------------


def q_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type runs (operators/scd.py):
    consecutive duplicates collapse, each run carries [valid_from,
    valid_to) and a version number."""
    events = _t(spark, sf_dir, "events")
    hist = scd.scd2_history(events, "user_id", "ts", "event_type")
    # Open intervals use a far-future sentinel (also dodges the
    # None-vs-NaT NULL-timestamp hash asymmetry between engines).  The
    # classic 9999-12-31 overflows pandas' nanosecond timestamps
    # (ceiling 2262-04-11) when a comparator materializes the oracle
    # result through pandas, so the convention here is 2260-12-31 —
    # same semantics, representable everywhere.
    return hist.withColumn(
        "valid_to",
        F.coalesce(
            "valid_to", F.lit("2260-12-31 00:00:00").cast("timestamp_ntz")
        ),
    ).orderBy("user_id", "version")


ORACLE_SCD2 = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from
  FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, state, valid_from,
       COALESCE(
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
         TIMESTAMP '2260-12-31 00:00:00') AS valid_to,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from)::BIGINT
         AS version,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         IS NULL AS is_current
FROM chg
ORDER BY user_id, version
"""


# ---------------------------------------------------------------------------
# Ordered funnel (view -> click -> purchase, strictly in event-time order)
# ---------------------------------------------------------------------------


def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/funnel.funnel_depth over the canonical view -> click ->
    purchase ladder: ordered subsequence match via chained
    conditional-min aggregations (state per user = one ts per stage)."""
    events = _t(spark, sf_dir, "events")
    return funnel.funnel_depth(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).orderBy("user_id")


ORACLE_FUNNEL = """
WITH keys AS (SELECT DISTINCT user_id FROM events),
s0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s0.t0
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s1.t1
  GROUP BY 1
)
SELECT k.user_id,
       s0.t0 IS NOT NULL AS reached_view,
       s1.t1 IS NOT NULL AS reached_click,
       s2.t2 IS NOT NULL AS reached_purchase,
       ((s0.t0 IS NOT NULL)::INT + (s1.t1 IS NOT NULL)::INT
        + (s2.t2 IS NOT NULL)::INT)::BIGINT AS funnel_depth
FROM keys k
LEFT JOIN s0 USING (user_id)
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
ORDER BY k.user_id
"""


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order journeys)
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/transitions.transition_matrix over the event log: global
    consecutive-pair counts per user, row-normalized probabilities."""
    events = _t(spark, sf_dir, "events")
    return transitions.transition_matrix(
        events, "user_id", "ts", "event_type"
    ).orderBy("from_type", "to_type")


ORACLE_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
           AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*)::BIGINT AS n_transitions
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       n_transitions::DOUBLE /
         (SUM(n_transitions) OVER (PARTITION BY from_type))::DOUBLE AS p
FROM counts
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# Column profile (per-column completeness / cardinality, one pass)
# ---------------------------------------------------------------------------


def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.profile_columns over orders: null + exact
    distinct counts for four columns in one aggregation pass."""
    orders = _t(spark, sf_dir, "orders")
    return profile.profile_columns(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    ).orderBy("column_name")


ORACLE_PROFILE = """
SELECT 'o_orderkey' AS column_name, COUNT(*)::BIGINT AS n_rows,
       SUM((o_orderkey IS NULL)::INT)::BIGINT AS n_nulls,
       COUNT(DISTINCT o_orderkey)::BIGINT AS n_distinct
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*)::BIGINT,
       SUM((o_custkey IS NULL)::INT)::BIGINT,
       COUNT(DISTINCT o_custkey)::BIGINT
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*)::BIGINT,
       SUM((o_orderstatus IS NULL)::INT)::BIGINT,
       COUNT(DISTINCT o_orderstatus)::BIGINT
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*)::BIGINT,
       SUM((o_orderpriority IS NULL)::INT)::BIGINT,
       COUNT(DISTINCT o_orderpriority)::BIGINT
FROM orders
ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# Fixed-width histogram + join-key skew diagnosis
# ---------------------------------------------------------------------------


def q_orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.histogram over o_totalprice: 12 fixed-width
    buckets on [0, 600000) plus under/overflow accounting."""
    orders = _t(spark, sf_dir, "orders")
    return profile.histogram(
        orders, "o_totalprice", 0.0, 600_000.0, 12
    ).orderBy("bucket")


ORACLE_HISTOGRAM = """
SELECT CASE WHEN o_totalprice::DOUBLE < 0.0 THEN 0
            WHEN o_totalprice::DOUBLE >= 600000.0 THEN 13
            ELSE floor((o_totalprice::DOUBLE - 0.0) * 12.0
                       / (600000.0 - 0.0))::BIGINT + 1
       END::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n
FROM orders
GROUP BY 1
ORDER BY bucket
"""


def q_lineitem_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.skew_report on lineitem's join key: the 10
    heaviest l_orderkey values and their share of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    return profile.skew_report(li, ["l_orderkey"], top=10).orderBy("rank")


ORACLE_SKEW_REPORT = """
WITH counts AS (
  SELECT l_orderkey, COUNT(*)::BIGINT AS n FROM lineitem GROUP BY 1
),
total AS (SELECT COUNT(*)::BIGINT AS t FROM lineitem),
ranked AS (
  SELECT l_orderkey, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, l_orderkey ASC)::BIGINT
           AS "rank"
  FROM counts
)
SELECT r.l_orderkey, r.n, r.n::DOUBLE / total.t::DOUBLE AS share, r."rank"
FROM ranked r CROSS JOIN total
WHERE r."rank" <= 10
ORDER BY r."rank"
"""


# ---------------------------------------------------------------------------
# Rolling distinct actives (WAU): trailing 7-day distinct users per day
# ---------------------------------------------------------------------------


def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/rolling.trailing_distinct_daily: distinct (day, user)
    collapse -> bounded offset explode -> per-day distinct count, with a
    distributed day spine zero-filling quiet days.  The oracle is the
    textbook spine-range-join form the operator deliberately avoids at
    scale."""
    events = _t(spark, sf_dir, "events")
    return rolling.trailing_distinct_daily(
        events, "ts", "user_id", window_days=7
    ).orderBy("day")


ORACLE_WAU = """
WITH dk AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM dk),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
)
SELECT s.day, COUNT(DISTINCT d.user_id)::BIGINT AS n_active
FROM spine s LEFT JOIN dk d ON d.day BETWEEN s.day - 6 AND s.day
GROUP BY s.day ORDER BY s.day
"""


def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/retention.cohort_retention: first-activity-week cohorts
    x weeks-since retention triangle over the events stream."""
    from netflix_data_ingestion_spark.operators.retention import (
        cohort_retention,
    )

    events = _t(spark, sf_dir, "events")
    # day-granularity cohorts: the synthetic stream spans 30 days, so
    # daily buckets give a full retention triangle (weekly would
    # collapse to one cohort)
    return cohort_retention(events, "user_id", "ts", bucket="day").orderBy(
        "cohort_week", "weeks_since"
    )


ORACLE_RETENTION = """
WITH first AS (
  SELECT user_id, min(date_trunc('day', ts))::DATE AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS active_week
  FROM events
),
cells AS (
  SELECT f.cohort_week,
         ((a.active_week - f.cohort_week) // 1)::BIGINT AS weeks_since,
         count(DISTINCT a.user_id)::BIGINT AS retained
  FROM active a JOIN first f USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, count(*)::BIGINT AS cohort_size
  FROM first GROUP BY 1
)
SELECT c.cohort_week, c.weeks_since, s.cohort_size, c.retained,
       c.retained::DOUBLE / s.cohort_size::DOUBLE AS retention_rate
FROM cells c JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, weeks_since
"""


def q_order_price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.equidepth_histogram: 16 equal-count price
    buckets with exact NTILE semantics, built on the distributed
    global_rank (no single-partition window over the table)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return profile.equidepth_histogram(
        orders, "o_totalprice", "o_orderkey", buckets=16
    ).orderBy("bucket")


ORACLE_EQUIDEPTH = """
WITH t AS (
  SELECT o_totalprice AS v,
         ntile(16) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT bucket::BIGINT AS bucket,
       count(*)::BIGINT AS n_rows,
       min(v) AS min_v,
       max(v) AS max_v
FROM t GROUP BY bucket
ORDER BY bucket
"""


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/rolling.trailing_ewma: 8-row adjusted EWMA per user
    (alpha=0.25), Horner-fold float discipline on both engines."""
    events = _t(spark, sf_dir, "events")
    return (
        rolling.trailing_ewma(
            events.select("user_id", "event_id", "ts", "value"),
            ["user_id"],
            ["ts", "event_id"],
            "value",
            window=8,
            alpha=0.25,
        )
        .select("user_id", "event_id", "value", "ewma")
        .orderBy("event_id")
    )


ORACLE_EWMA = """
WITH f AS (
  SELECT user_id, event_id, value,
         list(value::DOUBLE) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS frame
  FROM events
)
SELECT user_id, event_id, value,
       list_reduce(f.frame, (acc, x) -> acc * 0.75::DOUBLE + x)
       / list_reduce(list_transform(f.frame, y -> 1.0::DOUBLE),
                     (acc, x) -> acc * 0.75::DOUBLE + x) AS ewma
FROM f ORDER BY event_id
"""


def q_events_pit_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/scd.pit_enrich: point-in-time star join — every event
    picks up the SCD2 state version valid AT its timestamp (composition
    of scd2_history + the bucketed validity-interval hash join)."""
    events = _t(spark, sf_dir, "events")
    history = scd.scd2_history(events, "user_id", "ts", "event_type")
    return (
        scd.pit_enrich(
            events.select("event_id", "user_id", "ts"),
            history.withColumnRenamed("state", "state_at_event"),
            "user_id",
            "ts",
            ["state_at_event", "version"],
        )
        .select("event_id", "user_id", "state_at_event", "version")
        .orderBy("event_id")
    )


ORACLE_PIT_STATE = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from
  FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
),
hist AS (
  SELECT user_id, state AS state_at_event, valid_from,
         COALESCE(
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
           TIMESTAMP '2260-12-31 00:00:00') AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from)::BIGINT
           AS version
  FROM chg
)
SELECT e.event_id, e.user_id, h.state_at_event, h.version
FROM events e JOIN hist h
  ON h.user_id = e.user_id
 AND e.ts >= h.valid_from AND e.ts < h.valid_to
ORDER BY event_id
"""


def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/resample.ohlc_resample: hourly OHLC bars per event
    type — the hypertable downsample.  One combinable groupBy (min_by/
    max_by on a (ts, event_id) struct), no window sort; the exchange
    carries bar-level rows only.  Values are selected, not combined, so
    the DOUBLE column round-trips bit-exactly."""
    from netflix_data_ingestion_spark.operators.resample import (
        ohlc_resample,
    )

    events = read_table(spark, sf_dir, "events")
    return ohlc_resample(
        events, ["event_type"], "ts", "event_id", "value", bucket="hour"
    ).orderBy("event_type", "bucket")


ORACLE_OHLC = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events WHERE ts IS NOT NULL
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT event_type, bucket,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*)::BIGINT AS n_events
FROM r
GROUP BY 1, 2
ORDER BY 1, 2
"""


REGISTRY_WINDOW = {
    "events_ohlc_hourly": (q_events_ohlc_hourly, ORACLE_OHLC),
    "user_retention_cohorts": (q_user_retention_cohorts, ORACLE_RETENTION),
    "events_pit_state": (q_events_pit_state, ORACLE_PIT_STATE),
    "events_ewma": (q_events_ewma, ORACLE_EWMA),
    "order_price_equidepth": (q_order_price_equidepth, ORACLE_EQUIDEPTH),
    "weekly_active_users": (q_weekly_active_users, ORACLE_WAU),
    "event_transitions": (q_event_transitions, ORACLE_TRANSITIONS),
    "orders_profile": (q_orders_profile, ORACLE_PROFILE),
    "orders_price_histogram": (q_orders_price_histogram, ORACLE_HISTOGRAM),
    "lineitem_skew_report": (q_lineitem_skew_report, ORACLE_SKEW_REPORT),
    "events_gapfill": (q_events_gapfill, ORACLE_GAPFILL),
    "events_trailing_hour": (q_events_trailing_hour, ORACLE_TRAILING_HOUR),
    "user_state_history": (q_user_state_history, ORACLE_SCD2),
    "user_funnel": (q_user_funnel, ORACLE_FUNNEL),
    "events_asof_view_attribution": (
        q_events_asof_view_attribution,
        ORACLE_ASOF,
    ),
    "error_context_range_join": (
        q_error_context_range_join,
        ORACLE_RANGE_JOIN,
    ),
    "part_revenue_rank_in_brand": (
        q_part_revenue_rank_in_brand,
        ORACLE_BRAND_RANK,
    ),
    "running_event_total": (q_running_event_total, ORACLE_RUNNING_TOTAL),
    "events_sessionization": (q_events_sessionization, ORACLE_SESSIONIZATION),
    "pivot_event_types": (q_pivot_event_types, ORACLE_PIVOT),
    "orders_rollup": (q_orders_rollup, ORACLE_ROLLUP),
    "approx_distinct_users_daily": (
        q_approx_distinct_users_daily,
        ORACLE_APPROX_DISTINCT_DAILY,
    ),
    # round-9 tail additions (frozen r9 window unchanged; queue for the
    # r10 rotation): the forward and nearest as-of directions
    "events_asof_next_view": (q_events_asof_next_view, ORACLE_ASOF_FWD),
    "events_asof_nearest_view": (
        q_events_asof_nearest_view,
        ORACLE_ASOF_NEAREST,
    ),
}

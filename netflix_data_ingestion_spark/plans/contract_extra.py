"""Driver-contract queries: extended relational surface.

The reference's declared query layer (/root/reference/schema.sql:131-237,
README.md:450-474) stops at star joins + group-by/having/order/limit;
everything here is capability the same warehouse user reaches for next.

Multi-dimensional aggregation (CUBE), semi/anti set semantics (EXISTS,
EXCEPT), argmax-by-struct, discrete (interpolation-free) percentiles,
and a correlated-subquery shape — operators a warehouse user of the
reference's star schema reaches for next, each with a DuckDB oracle
twin.  Cross-engine exactness discipline: aggregates rounded once,
argmax ties broken through struct ordering on exact (non-aggregated)
values, medians picked discretely by rank so no interpolation
arithmetic exists to diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import merge
from netflix_data_ingestion_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# CUBE: all aggregation slices of (order year, status) in one pass
# ---------------------------------------------------------------------------


def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return (
        orders.cube("order_year", "o_orderstatus")
        .agg(
            F.count("*").alias("count_order"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


ORACLE_ORDERS_CUBE = """
SELECT year(o_orderdate)::INT AS order_year, o_orderstatus,
       COUNT(*) AS count_order,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE(order_year, o_orderstatus)
ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST
"""


# ---------------------------------------------------------------------------
# GROUPING SETS: two independent, non-hierarchical slices in one pass —
# the shape CUBE (all 2^n slices) and ROLLUP (hierarchical prefixes)
# cannot express.  One shuffle instead of two single-dimension group-bys.
# ---------------------------------------------------------------------------


def q_lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    return (
        li.groupingSets(
            [["ship_year"], ["l_returnflag"]], "ship_year", "l_returnflag"
        )
        .agg(
            F.count("*").alias("count_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_revenue"),
        )
        .orderBy(
            F.col("ship_year").asc_nulls_first(),
            F.col("l_returnflag").asc_nulls_first(),
        )
    )


ORACLE_LINEITEM_GROUPING_SETS = """
SELECT year(l_shipdate)::INT AS ship_year, l_returnflag,
       COUNT(*) AS count_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue
FROM lineitem
GROUP BY GROUPING SETS ((ship_year), (l_returnflag))
ORDER BY ship_year NULLS FIRST, l_returnflag NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Left-semi join (EXISTS): customers with at least one urgent order
# ---------------------------------------------------------------------------


def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_URGENT_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# EXCEPT: customers active in 1995 who placed nothing in 1996
# ---------------------------------------------------------------------------


def q_lapsed_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    in_1995 = orders.filter(F.col("yr") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    in_1996 = orders.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    )
    # exceptAll would keep duplicates; EXCEPT DISTINCT is the set form
    return in_1995.subtract(in_1996).orderBy("c_custkey")


ORACLE_LAPSED_EXCEPT = """
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Argmax by struct ordering: priciest part per brand, tie-broken by key
# ---------------------------------------------------------------------------


def q_brand_priciest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    # struct max = lexicographic (value, key): ties on the exact parquet
    # double break deterministically to the HIGHEST partkey in both engines
    best = part.groupBy("p_brand").agg(
        F.max(
            F.struct(
                F.col("p_retailprice").alias("v"), F.col("p_partkey").alias("k")
            )
        ).alias("m")
    )
    return best.select(
        "p_brand",
        F.col("m.v").alias("max_retailprice"),
        F.col("m.k").alias("priciest_partkey"),
    ).orderBy("p_brand")


ORACLE_BRAND_PRICIEST = """
SELECT p_brand,
       (max({'v': p_retailprice, 'k': p_partkey})).v AS max_retailprice,
       (max({'v': p_retailprice, 'k': p_partkey})).k AS priciest_partkey
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Discrete median: per-segment median order value, rank-picked (no
# interpolation arithmetic -> no cross-engine float divergence)
# ---------------------------------------------------------------------------


def q_median_order_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_totalprice", "o_orderkey")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wn = Window.partitionBy("c_mktsegment")
    ranked = j.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    return (
        ranked.filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select(
            "c_mktsegment",
            F.col("o_totalprice").alias("median_price"),
            F.col("n").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_MEDIAN_SEGMENT = """
WITH j AS (
  SELECT c.c_mktsegment, o.o_totalprice, o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT c_mktsegment, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
)
SELECT c_mktsegment, o_totalprice AS median_price, n AS n_orders
FROM ranked WHERE rn = CEIL(n / 2.0)
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Correlated-subquery shape: orders strictly above their customer's average
# ---------------------------------------------------------------------------


def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust_avg = orders.groupBy("o_custkey").agg(
        (F.sum("o_totalprice") / F.count("*")).alias("avg_price")
    )
    return (
        orders.join(cust_avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
        .orderBy("o_custkey")
    )


ORACLE_ABOVE_AVG = """
WITH ca AS (
  SELECT o_custkey, SUM(o_totalprice) / COUNT(*) AS avg_price
  FROM orders GROUP BY 1
)
SELECT o.o_custkey, COUNT(*) AS n_above
FROM orders o JOIN ca USING (o_custkey)
WHERE o.o_totalprice > ca.avg_price
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Deep star join: revenue by (region, nation, year) across 5 tables
# (TPC-H Q5 shape) — the dims broadcast, only the fact chain shuffles
# ---------------------------------------------------------------------------


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region_name", "nation_name", "order_year")
    )


def q_order_price_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/metrics.auc_roc: exact tie-aware AUC of order total
    (cents) ranking the 'is the order fulfilled (F)' label — the
    Mann-Whitney pair count over per-distinct-score integer
    aggregates, one final division."""
    from netflix_data_ingestion_spark.operators.metrics import auc_roc

    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "F").alias("label"), "o_totalprice"
    )
    return auc_roc(orders, "label", "o_totalprice", scale=100)


ORACLE_PRICE_AUC = """
WITH base AS (
  SELECT (o_orderstatus = 'F') AS y,
         round(o_totalprice * 100)::BIGINT AS s
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
),
per_score AS (
  SELECT s, COUNT(CASE WHEN y THEN 1 END)::BIGINT AS np,
         COUNT(CASE WHEN NOT y THEN 1 END)::BIGINT AS nn
  FROM base GROUP BY s
),
contrib AS (
  SELECT np, nn,
         np::HUGEINT * (2 * coalesce(SUM(nn) OVER
             (ORDER BY s ASC ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) + nn)::HUGEINT AS u2
  FROM per_score
)
SELECT SUM(np)::BIGINT AS n_pos, SUM(nn)::BIGINT AS n_neg,
       CASE WHEN SUM(np) > 0 AND SUM(nn) > 0
            THEN ROUND(SUM(u2)::DOUBLE /
                       (2 * SUM(np)::HUGEINT * SUM(nn)::HUGEINT)::DOUBLE, 6)
       END AS auc
FROM contrib
"""


def q_events_cooldown_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bursts.cooldown_throttle: 10-minute cool-down per
    (user, event_type) — every ADMISSION resets the clock (contrast
    with events_burst_collapse's island semantics on the same data);
    JVM-side greedy fold, (ts, event_id) total order.  NULL user_id
    rows excluded (keys must join back)."""
    from netflix_data_ingestion_spark.operators.bursts import (
        cooldown_throttle,
    )

    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).where(F.col("user_id").isNotNull())
    return cooldown_throttle(
        events, ["user_id", "event_type"], "ts", "event_id",
        gap_seconds=600,
    ).orderBy("event_id")


ORACLE_COOLDOWN_THROTTLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_type, event_id, ts, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
adm(user_id, event_type, event_id, ts, t, rn) AS (
  SELECT user_id, event_type, event_id, ts, t, rn FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.t, e.rn
  FROM adm a JOIN ev e
    ON e.user_id = a.user_id AND e.event_type = a.event_type
   AND e.t >= a.t + 600000000
  WHERE e.rn = (SELECT MIN(e2.rn) FROM ev e2
                WHERE e2.user_id = a.user_id
                  AND e2.event_type = a.event_type
                  AND e2.t >= a.t + 600000000)
)
SELECT event_id, user_id, event_type, ts
FROM adm ORDER BY event_id
"""


def q_part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC analysis: parts ranked by revenue; cumulative share in
    exact ppm classifies A (first 80% of revenue), B (to 95%), C (tail)
    — the inventory-priority classic.  The cumulative revenue is a
    DISTRIBUTED prefix sum (operators/keys.prefix_sum_ranged over the
    (revenue desc, partkey) total order — no single-task sort of the
    catalog, which at 100 TB is 10^7+ parts); the grand total is a
    1-row broadcast off the same pinned frame; shares integer-divided."""
    from netflix_data_ingestion_spark.operators.keys import (
        prefix_sum_ranged,
    )

    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "revenue_cents"
        )
    )
    pre = prefix_sum_ranged(
        per_part,
        [F.col("revenue_cents").desc(), F.col("p_partkey").asc()],
        "revenue_cents",
        "__pre",
    )
    totals = pre.agg(F.sum("revenue_cents").alias("__total"))
    ranked = pre.crossJoin(F.broadcast(totals)).select(
        "p_partkey",
        "revenue_cents",
        (F.col("__pre") + F.col("revenue_cents")).alias("__cum"),
        "__total",
    )
    cum_ppm = F.expr("(__cum * 1000000) div __total")
    return ranked.select(
        "p_partkey",
        "revenue_cents",
        cum_ppm.alias("cum_share_ppm"),
        F.when(cum_ppm <= 800000, "A")
        .when(cum_ppm <= 950000, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy("p_partkey")


ORACLE_ABC_CLASSES = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_cents
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT p_partkey, revenue_cents,
         SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, p_partkey ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(revenue_cents) OVER () AS total
  FROM per_part
)
SELECT p_partkey, revenue_cents,
       CAST((cum * 1000000) // total AS BIGINT) AS cum_share_ppm,
       CASE WHEN (cum * 1000000) // total <= 800000 THEN 'A'
            WHEN (cum * 1000000) // total <= 950000 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY p_partkey
"""


def q_session_entry_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing analysis: sessions (30-min gap windows) grouped by their
    ENTRY event type — session counts, how many contained a purchase,
    and the conversion rate in exact ppm; the funnel-adjacent BI shape
    built on session_window + a (ts, event_id) min_by entry pick."""
    events = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    per_session = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
    ).agg(
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("entry_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("__conv"),
    )
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("__conv").cast("long").alias("n_converted"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_converted",
            F.expr("(n_converted * 1000000) div n_sessions").alias(
                "conversion_ppm"
            ),
        )
        .orderBy("entry_type")
    )


ORACLE_SESSION_ENTRY = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
),
islands AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) AS rn
        FROM islands)
  GROUP BY 1, 2
)
SELECT entry_type, COUNT(*)::BIGINT AS n_sessions,
       SUM(conv)::BIGINT AS n_converted,
       CAST((SUM(conv) * 1000000) // COUNT(*) AS BIGINT) AS conversion_ppm
FROM per_session GROUP BY 1 ORDER BY entry_type
"""


def q_events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/resample.time_weighted_average: per (user, day)
    duration-weighted mean of the step signal — integer-microsecond
    weights x fixed-point values in DECIMAL(38,0), one final
    division; single-sample days carry zero span and NULL average."""
    from netflix_data_ingestion_spark.operators.resample import (
        time_weighted_average,
    )

    events = _t(spark, sf_dir, "events")
    return time_weighted_average(
        events, "user_id", "ts", "value", bucket="day", scale=100
    ).orderBy("user_id", "bucket_ts")


ORACLE_TWAP_DAILY = """
WITH base AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts,
         epoch_us(ts) AS t, round(value * 100)::BIGINT AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
stepped AS (
  SELECT *, LEAD(t) OVER (PARTITION BY user_id, bucket_ts
                          ORDER BY t ASC, v ASC) AS next_t
  FROM base
),
g AS (
  SELECT user_id, bucket_ts,
         COUNT(*)::BIGINT AS n_samples,
         SUM(CASE WHEN next_t IS NOT NULL THEN next_t - t END)::HUGEINT
           AS span,
         SUM(CASE WHEN next_t IS NOT NULL
                  THEN v::HUGEINT * (next_t - t) END)::HUGEINT AS wsum
  FROM stepped GROUP BY 1, 2
)
SELECT user_id, bucket_ts, n_samples,
       coalesce(span, 0)::BIGINT AS span_micros,
       CASE WHEN span > 0
            THEN ROUND(wsum::DOUBLE / span::DOUBLE, 6) END AS twa_value
FROM g
ORDER BY user_id, bucket_ts
"""


def q_order_class_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/metrics.classification_report: the 200k-cent threshold
    as the operating point for 'is the order fulfilled' — confusion
    counts + precision/recall/F1, each ONE division of exact counts."""
    from netflix_data_ingestion_spark.operators.metrics import (
        classification_report,
    )

    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "F").alias("label"), "o_totalprice"
    )
    return classification_report(
        orders, "label", "o_totalprice", threshold=2000.0, scale=100
    )


ORACLE_CLASS_REPORT = """
WITH base AS (
  SELECT (o_orderstatus = 'F') AS y,
         (round(o_totalprice * 100)::BIGINT >= 200000) AS p
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
),
g AS (
  SELECT COUNT(CASE WHEN y AND p THEN 1 END)::BIGINT AS tp,
         COUNT(CASE WHEN NOT y AND p THEN 1 END)::BIGINT AS fp,
         COUNT(CASE WHEN NOT y AND NOT p THEN 1 END)::BIGINT AS tn,
         COUNT(CASE WHEN y AND NOT p THEN 1 END)::BIGINT AS fn
  FROM base
)
SELECT tp, fp, tn, fn,
       CASE WHEN tp + fp > 0 THEN ROUND(tp / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn > 0 THEN ROUND(tp / (tp + fn), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN ROUND(2 * tp / (2 * tp + fp + fn), 6) END AS f1
FROM g
"""


def q_events_ab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/abtest.ab_report: salted-md5 50/50 user assignment +
    per-arm exact-moment metric report (mean/sample variance of event
    value in cents, one pass, one final double division)."""
    from netflix_data_ingestion_spark.operators.abtest import ab_report

    events = _t(spark, sf_dir, "events")
    return ab_report(events, "user_id", "value", salt="exp1", scale=100).orderBy(
        "arm"
    )


ORACLE_AB_REPORT = """
WITH base AS (
  SELECT user_id,
         CASE WHEN (strpos('0123456789abcdef',
                           substr(md5('exp1|' || user_id::VARCHAR), 1, 1))
                    - 1) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         round(value * 100)::BIGINT AS v
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
),
g AS (
  SELECT arm, COUNT(DISTINCT user_id)::BIGINT AS n_units,
         COUNT(*)::HUGEINT AS n, SUM(v::HUGEINT) AS s,
         SUM(v::HUGEINT * v) AS q
  FROM base GROUP BY 1
)
SELECT arm, n_units, n::BIGINT AS n_events,
       ROUND(s::DOUBLE / n::DOUBLE, 6) AS mean_value,
       CASE WHEN n > 1
            THEN ROUND((n * q - s * s)::DOUBLE / (n * (n - 1))::DOUBLE, 6)
       END AS var_value
FROM g ORDER BY arm
"""


def q_lineitem_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/digest.table_digest: order/partition-invariant content
    digest of lineitem over canonicalized columns (keys as ints, money
    as cents) — the cross-system parity check; the oracle computing the
    SAME digest in DuckDB is the point."""
    from netflix_data_ingestion_spark.operators.digest import table_digest

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("c1"),
        F.col("l_partkey").cast("string").alias("c2"),
        F.col("l_suppkey").cast("string").alias("c3"),
        F.round(F.col("l_quantity") * 100).cast("long").cast("string").alias("c4"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string").alias("c5"),
        F.col("l_returnflag").alias("c6"),
    )
    return table_digest(li)


ORACLE_TABLE_DIGEST = """
WITH canon AS (
  SELECT concat_ws('|',
           coalesce(l_orderkey::VARCHAR, chr(1) || 'NULL'),
           coalesce(l_partkey::VARCHAR, chr(1) || 'NULL'),
           coalesce(l_suppkey::VARCHAR, chr(1) || 'NULL'),
           coalesce(round(l_quantity * 100)::BIGINT::VARCHAR, chr(1) || 'NULL'),
           coalesce(round(l_extendedprice * 100)::BIGINT::VARCHAR, chr(1) || 'NULL'),
           coalesce(l_returnflag, chr(1) || 'NULL')
         ) AS s
  FROM lineitem
)
SELECT COUNT(*)::BIGINT AS n_rows,
       SUM(('0x' || substr(md5(s), 1, 12))::BIGINT)::VARCHAR AS digest
FROM canon
"""


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent analytic: each nation's revenue as an exact ppm
    share of its REGION's total (integer cents summed per lineitem,
    one window sum per region, integer division), plus its rank in the
    region — the hierarchy-share report shape (child / parent level)
    that rollup alone doesn't give."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    wr = W.partitionBy("region_name")
    return per_nation.select(
        "region_name",
        "nation_name",
        "revenue_cents",
        F.expr(
            "(revenue_cents * 1000000) div sum(revenue_cents)"
            " over (partition by region_name)"
        ).alias("share_ppm"),
        F.row_number()
        .over(
            wr.orderBy(
                F.col("revenue_cents").desc(), F.col("nation_name").asc()
            )
        )
        .cast("int")
        .alias("rank_in_region"),
    ).orderBy("region_name", "rank_in_region")


ORACLE_NATION_SHARE = """
WITH per_nation AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         SUM(round(l.l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region_name, nation_name, revenue_cents,
       CAST((revenue_cents * 1000000)
         // SUM(revenue_cents) OVER (PARTITION BY region_name) AS BIGINT)
         AS share_ppm,
       ROW_NUMBER() OVER (PARTITION BY region_name
                          ORDER BY revenue_cents DESC, nation_name ASC)::INT
         AS rank_in_region
FROM per_nation
ORDER BY region_name, rank_in_region
"""


ORACLE_REGIONAL_REVENUE = """
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       year(o.o_orderdate)::INT AS order_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# lag(): inter-event gaps per user; avg as one exact integer division
# ---------------------------------------------------------------------------


def q_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    gaps = events.select(
        "user_id",
        # microsecond diffs: exact integers in both engines — DuckDB's
        # date_diff('second') counts BOUNDARY crossings while Spark's
        # timestampdiff(SECOND) truncates elapsed time, so second-level
        # gaps disagree by 1; at microsecond granularity the two
        # definitions coincide (timestamps are exactly-us precision)
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            (
                F.sum("gap_us").cast("double")
                / F.count("*").cast("double")
            ).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


ORACLE_USER_GAPS = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC),
                   ts) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps, MAX(gap_us) AS max_gap_us,
       SUM(gap_us)::DOUBLE / COUNT(*)::DOUBLE AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# ntile(): account-balance quartiles (unique-ified ordering for parity)
# ---------------------------------------------------------------------------


def q_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/keys.ntile_ranged: exact SQL ntile(4) computed
    distributed (range partition + local rank + broadcast offsets) —
    no single-task global sort even with 10^8 customers."""
    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    cust = _t(spark, sf_dir, "customer")
    quartiled = ntile_ranged(
        cust.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        4,
        "quartile",
    )
    return (
        quartiled.groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("quartile")
    )


ORACLE_BALANCE_QUARTILES = """
WITH q AS (
  SELECT c_custkey,
         ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)::INT
           AS quartile,
         c_acctbal
  FROM customer
)
SELECT quartile, COUNT(*) AS n_customers,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM q GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# INTERSECT: customers active in BOTH 1995 and 1996
# ---------------------------------------------------------------------------


def q_retained_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    in_1995 = orders.filter(F.col("yr") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    in_1996 = orders.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return in_1995.intersect(in_1996).orderBy("c_custkey")


ORACLE_RETAINED_INTERSECT = """
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# MERGE upsert: CDC batch applied to a snapshot (update + insert + delete)
# ---------------------------------------------------------------------------


def q_customer_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/merge.merge_upsert over a deterministic synthetic CDC
    batch: every 10th customer re-segmented with a balance credit
    (update), a shadow row per 97th customer at key+10M (insert), and
    every 25th customer tombstoned (delete)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # delete wins over update for keys matching both rules — the batch
    # must be key-unique or the full-outer join would fan out
    upd = (
        cust.filter(
            (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 25 != 0)
        )
        .select(
            "c_custkey",
            F.lit("REPRICED").alias("c_mktsegment"),
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        )
        .withColumn("deleted", F.lit(False))
    )
    ins = (
        cust.filter(F.col("c_custkey") % 97 == 0)
        .select(
            (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
            F.lit("SHADOW").alias("c_mktsegment"),
            F.lit(0.0).alias("c_acctbal"),
        )
        .withColumn("deleted", F.lit(False))
    )
    dels = cust.filter(F.col("c_custkey") % 25 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(True).alias("deleted"),
    )
    batch = upd.unionByName(ins).unionByName(dels)
    return merge.merge_upsert(
        cust, batch, ["c_custkey"], tombstone_col="deleted"
    ).orderBy("c_custkey")


ORACLE_MERGE_UPSERT = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
),
batch AS (
  SELECT c_custkey, 'REPRICED' AS c_mktsegment, c_acctbal + 100.0 AS c_acctbal,
         FALSE AS deleted
  FROM cust WHERE c_custkey % 10 = 0 AND c_custkey % 25 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, 'SHADOW', 0.0, FALSE
  FROM cust WHERE c_custkey % 97 = 0
  UNION ALL
  SELECT c_custkey, NULL, NULL, TRUE
  FROM cust WHERE c_custkey % 25 = 0
),
joined AS (
  SELECT COALESCE(b.c_custkey, t.c_custkey) AS c_custkey,
         CASE WHEN b.c_custkey IS NOT NULL THEN b.c_mktsegment
              ELSE t.c_mktsegment END AS c_mktsegment,
         CASE WHEN b.c_custkey IS NOT NULL THEN b.c_acctbal
              ELSE t.c_acctbal END AS c_acctbal,
         b.deleted
  FROM cust t FULL OUTER JOIN batch b USING (c_custkey)
)
SELECT c_custkey, c_mktsegment, c_acctbal
FROM joined
WHERE NOT COALESCE(deleted, FALSE)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Exact multi-quantile profile (one windowed pass, nearest-rank)
# ---------------------------------------------------------------------------


def q_order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.exact_quantiles: p25/p50/p75/p90 of order total
    price per order status, picked by nearest rank in one windowed pass
    (generalizes median_order_by_segment to a full profile row)."""
    from netflix_data_ingestion_spark.operators.profile import exact_quantiles

    orders = _t(spark, sf_dir, "orders")
    return exact_quantiles(
        orders, ["o_orderstatus"], "o_totalprice", qs=(0.25, 0.5, 0.75, 0.9)
    ).orderBy("o_orderstatus")


ORACLE_PRICE_QUANTILES = """
WITH r AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, MAX(n)::BIGINT AS n,
       MAX(CASE WHEN rn = CEIL(0.25 * n) THEN o_totalprice END) AS p25,
       MAX(CASE WHEN rn = CEIL(0.5 * n) THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rn = CEIL(0.75 * n) THEN o_totalprice END) AS p75,
       MAX(CASE WHEN rn = CEIL(0.9 * n) THEN o_totalprice END) AS p90
FROM r GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Skew machinery under oracle: salted join + two-phase salted aggregation
# ---------------------------------------------------------------------------


def q_brand_quantity_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.salted_join + salted_agg: lineitem (big, salted on
    row hash) joins part (small, replicated across 8 salts) then a
    two-phase (brand, salt)->brand aggregation — the manual skew path
    for when AQE's sort-merge split doesn't apply.  The oracle is the
    plain join+group-by: equality proves salting is semantically
    invisible.  Quantity sums are int64 fixed-point so the two-phase
    combine is bit-exact regardless of salt distribution."""
    from netflix_data_ingestion_spark.operators import skew

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("q"),
        "l_extendedprice",
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = skew.salted_join(li, part, "l_partkey", n_salts=8)
    agg = skew.salted_agg(
        joined,
        ["p_brand"],
        {
            "n_items": ("q", "count"),
            "q_total": ("q", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=8,
    )
    return agg.select(
        "p_brand",
        "n_items",
        (F.col("q_total").cast("double") / F.lit(100.0)).alias("sum_qty"),
        "max_price",
    ).orderBy("p_brand")


ORACLE_BRAND_SALTED = """
SELECT p.p_brand,
       COUNT(*)::BIGINT AS n_items,
       SUM(round(l.l_quantity * 100)::BIGINT)::BIGINT::DOUBLE / 100.0
         AS sum_qty,
       MAX(l.l_extendedprice) AS max_price
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: merge partial aggregates algebraically
# ---------------------------------------------------------------------------


def q_daily_summary_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/merge.merge_aggregates: the events table is split by
    event_id parity into two 'delta partitions', each aggregated to
    per-day partials (count + int64 fixed-point sum + min/max), then the
    partials are MERGED instead of re-aggregating the union.  The oracle
    aggregates the whole table in one pass — equality proves the
    combine is exact for any split, which is the incremental-view
    maintenance contract."""
    events = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("q"),
        "value",
    )

    def partial(half: DataFrame) -> DataFrame:
        return half.groupBy("day").agg(
            F.count("*").alias("n_events"),
            F.sum("q").alias("q_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    p_even = partial(events.filter(F.col("event_id") % 2 == 0))
    p_odd = partial(events.filter(F.col("event_id") % 2 == 1))
    merged = merge.merge_aggregates(
        p_even,
        p_odd,
        ["day"],
        sum_cols=["n_events", "q_value"],
        min_cols=["min_value"],
        max_cols=["max_value"],
    )
    return merged.select(
        "day",
        "n_events",
        (F.col("q_value").cast("double") / F.lit(100.0)).alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("day")


ORACLE_INCREMENTAL_AGG = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(*)::BIGINT AS n_events,
       SUM(round(value * 100)::BIGINT)::BIGINT::DOUBLE / 100.0 AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Snapshot diff: generate the CDC feed between two snapshots (inverse MERGE)
# ---------------------------------------------------------------------------


def q_customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/merge.snapshot_diff between the customer snapshot and a
    deterministically mutated successor: every 25th key dropped
    (delete), every remaining 10th re-segmented with a balance credit
    (update), a shadow row per 97th key at key+10M (insert).  The
    output is the change feed merge_upsert would need to reproduce the
    successor."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    upd = F.col("c_custkey") % 10 == 0
    new = (
        cust.filter(F.col("c_custkey") % 25 != 0)
        .select(
            "c_custkey",
            F.when(upd, F.lit("REPRICED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.when(upd, F.col("c_acctbal") + F.lit(100.0))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
                F.lit("SHADOW").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    return merge.snapshot_diff(
        cust, new, ["c_custkey"], ["c_mktsegment", "c_acctbal"]
    ).orderBy("c_custkey")


ORACLE_SNAPSHOT_DIFF = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN 'REPRICED'
              ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal
  FROM cust WHERE c_custkey % 25 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, 'SHADOW', 0.0
  FROM cust WHERE c_custkey % 97 = 0
),
j AS (
  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
         o.c_custkey IS NOT NULL AS in_old,
         n.c_custkey IS NOT NULL AS in_new,
         o.c_mktsegment AS o_seg, o.c_acctbal AS o_bal,
         n.c_mktsegment AS n_seg, n.c_acctbal AS n_bal
  FROM cust o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
),
typed AS (
  SELECT c_custkey,
         CASE WHEN NOT in_old THEN 'insert'
              WHEN NOT in_new THEN 'delete'
              WHEN (o_seg IS DISTINCT FROM n_seg)
                OR (o_bal IS DISTINCT FROM n_bal) THEN 'update'
         END AS change_type,
         n_seg AS c_mktsegment, n_bal AS c_acctbal
  FROM j
)
SELECT c_custkey, change_type, c_mktsegment, c_acctbal
FROM typed WHERE change_type IS NOT NULL
ORDER BY c_custkey
"""


def q_order_price_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/outliers.mad_outliers: robust median/MAD screen at
    k = 9/5 (uniform prices put MAD at a quarter of the range, so 1.8
    MADs flags the ~10% tails) — exact nearest-rank medians, strict
    integer decision."""
    from netflix_data_ingestion_spark.operators.outliers import (
        mad_outliers,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return (
        mad_outliers(
            orders, ["o_orderstatus"], "o_totalprice", k_num=9, k_den=5
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "value_units",
            "group_median",
            "group_mad",
            "is_high",
        )
        .orderBy("o_orderkey")
    )


ORACLE_MAD_OUTLIERS = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         round(o_totalprice * 100)::BIGINT AS v
  FROM orders
),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY v ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM base
),
med AS (
  SELECT o_orderstatus, MAX(CASE WHEN rn = CEIL(0.5 * n) THEN v END) AS m
  FROM r1 GROUP BY 1
),
d AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.v, m.m,
         abs(b.v - m.m) AS dev
  FROM base b JOIN med m USING (o_orderstatus)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY dev ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM d
),
mad AS (
  SELECT o_orderstatus, MAX(CASE WHEN rn = CEIL(0.5 * n) THEN dev END) AS mad
  FROM r2 GROUP BY 1
)
SELECT d.o_orderkey, d.o_orderstatus, d.v AS value_units,
       d.m AS group_median, mad.mad AS group_mad,
       d.v > d.m AS is_high
FROM d JOIN mad USING (o_orderstatus)
WHERE d.dev * 5 > 9 * mad.mad
ORDER BY o_orderkey
"""


def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/outliers.seasonal_anomalies: hourly volumes vs their
    (day-of-week, hour-of-day) seasonal median/MAD band at k=2 — exact
    nearest-rank medians, strict integer decision, monday0 dow
    contract."""
    from netflix_data_ingestion_spark.operators.outliers import (
        seasonal_anomalies,
    )

    events = _t(spark, sf_dir, "events")
    return seasonal_anomalies(events, "ts", k_num=2, k_den=1).orderBy(
        "bucket_ts"
    )


ORACLE_SEASONAL_ANOMALY = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_ts, COUNT(*)::BIGINT AS cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
keyed AS (
  SELECT bucket_ts, CAST(isodow(bucket_ts) - 1 AS INT) AS dow,
         CAST(hour(bucket_ts) AS INT) AS hod, cnt
  FROM hourly
),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dow, hod ORDER BY cnt ASC) AS rn,
         COUNT(*) OVER (PARTITION BY dow, hod) AS n
  FROM keyed
),
med AS (
  SELECT dow, hod, MAX(CASE WHEN rn = CEIL(0.5 * n) THEN cnt END) AS m
  FROM r1 GROUP BY 1, 2
),
d AS (
  SELECT k.bucket_ts, k.dow, k.hod, k.cnt, m.m,
         abs(k.cnt - m.m) AS dev
  FROM keyed k JOIN med m USING (dow, hod)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dow, hod ORDER BY dev ASC) AS rn,
         COUNT(*) OVER (PARTITION BY dow, hod) AS n
  FROM d
),
mad AS (
  SELECT dow, hod, MAX(CASE WHEN rn = CEIL(0.5 * n) THEN dev END) AS mad
  FROM r2 GROUP BY 1, 2
)
SELECT d.bucket_ts, d.dow, d.hod, d.cnt,
       d.m AS season_median, mad.mad AS season_mad,
       d.cnt > d.m AS is_high
FROM d JOIN mad USING (dow, hod)
WHERE d.dev * 1 > 2 * mad.mad
ORDER BY bucket_ts
"""


def q_user_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/forget: right-to-be-forgotten cascade audit — the
    AUTOMOBILE-segment customers as the forget-set, broadcast anti-join
    deletes on customer/orders/events, lineitem cascaded through the
    order keys actually removed; exact single-pass accounting."""
    from netflix_data_ingestion_spark.operators.forget import (
        forget_audit,
        forget_keys,
    )

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")
    keys = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey"
    )
    _, removed_orderkeys = forget_keys(
        orders, "o_custkey", keys, "c_custkey", emit_col="o_orderkey"
    )
    return forget_audit(
        [
            ("customer", cust, "c_custkey", keys, "c_custkey"),
            ("orders", orders, "o_custkey", keys, "c_custkey"),
            ("lineitem", lineitem, "l_orderkey", removed_orderkeys, "o_orderkey"),
            ("events", events, "user_id", keys, "c_custkey"),
        ]
    ).orderBy("table_name")


ORACLE_FORGET_AUDIT = """
WITH fs AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
ro AS (SELECT DISTINCT o_orderkey FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM fs)),
a AS (
  SELECT 'customer' AS table_name,
         (SELECT COUNT(*) FROM customer)::BIGINT AS rows_before,
         (SELECT COUNT(*) FROM customer
          WHERE c_custkey IN (SELECT c_custkey FROM fs))::BIGINT AS rows_removed
  UNION ALL
  SELECT 'orders',
         (SELECT COUNT(*) FROM orders)::BIGINT,
         (SELECT COUNT(*) FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM fs))::BIGINT
  UNION ALL
  SELECT 'lineitem',
         (SELECT COUNT(*) FROM lineitem)::BIGINT,
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM ro))::BIGINT
  UNION ALL
  SELECT 'events',
         (SELECT COUNT(*) FROM events)::BIGINT,
         (SELECT COUNT(*) FROM events
          WHERE user_id IN (SELECT c_custkey FROM fs))::BIGINT
)
SELECT table_name, rows_before, rows_removed,
       (rows_before - rows_removed)::BIGINT AS rows_after
FROM a ORDER BY table_name
"""


def q_customer_busy_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/intervals.merge_intervals: per-customer union of
    order-in-flight intervals [o_orderdate, max l_shipdate] — the
    interval twin of point sessionization."""
    from netflix_data_ingestion_spark.operators.intervals import (
        merge_intervals,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    spans = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship_end"))
    )
    return merge_intervals(
        spans, ["o_custkey"], "o_orderdate", "ship_end"
    ).orderBy("o_custkey", "period_start")


ORACLE_BUSY_PERIODS = """
WITH spans AS (
  SELECT o.o_custkey, o.o_orderdate AS s, max(l.l_shipdate) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
),
flagged AS (
  SELECT o_custkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM spans
),
islands AS (
  SELECT o_custkey, s, e,
         sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
)
SELECT o_custkey, min(s) AS period_start, max(e) AS period_end,
       count(*)::BIGINT AS n_intervals
FROM islands GROUP BY o_custkey, island
ORDER BY o_custkey, period_start
"""


def q_part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/fuzzy.fuzzy_name_pairs: distinct part names within
    Levenshtein distance 2, found via lossless length-band blocking —
    the oracle is the pure edit-distance predicate, no blocking."""
    from netflix_data_ingestion_spark.operators.fuzzy import (
        fuzzy_name_pairs,
    )

    part = _t(spark, sf_dir, "part")
    return fuzzy_name_pairs(part, "p_name", max_dist=2).orderBy(
        "name_a", "name_b"
    )


def q_orders_priority_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/encode.target_encode_loo: leak-free leave-one-out mean
    of the order total (cents) per priority class — one int/int
    division, category stats broadcast, fact never shuffled."""
    from netflix_data_ingestion_spark.operators.encode import (
        target_encode_loo,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode_loo(
        orders, "o_orderpriority", "o_totalprice", scale=100
    ).orderBy("o_orderkey")


ORACLE_PRIORITY_ENCODING = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         round(o_totalprice * 100)::BIGINT AS y, o_totalprice
  FROM orders
),
stats AS (
  SELECT o_orderpriority AS cat, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS s
  FROM base WHERE y IS NOT NULL GROUP BY 1
)
SELECT b.o_orderkey, b.o_orderpriority, b.o_totalprice,
       CASE WHEN b.y IS NOT NULL AND st.n > 1
            THEN (st.s - b.y)::DOUBLE / (st.n - 1)::DOUBLE END AS loo_mean
FROM base b LEFT JOIN stats st
  ON b.o_orderpriority IS NOT DISTINCT FROM st.cat
ORDER BY o_orderkey
"""


def q_events_burst_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bursts.collapse_bursts: per (user, event_type), runs of
    events chained within 10 minutes collapse to their first event +
    burst_size — microsecond gap arithmetic, (ts, event_id) total
    order."""
    from netflix_data_ingestion_spark.operators.bursts import (
        collapse_bursts,
    )

    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return collapse_bursts(
        events, ["user_id", "event_type"], "ts", "event_id",
        gap_seconds=600,
    ).orderBy("event_id")


ORACLE_BURST_COLLAPSE = """
WITH e AS (
  SELECT event_id, user_id, event_type, ts FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT *,
         CASE WHEN LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) >= 600000000
              THEN 1 ELSE 0 END AS brk
  FROM e
),
isl AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, island
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type, island)::BIGINT
           AS burst_size
  FROM isl
)
SELECT event_id, user_id, event_type, ts, burst_size
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


def q_orders_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/drift.drift_report: order totals before vs from 1999
    over reference-derived equi-depth deciles — per-bin counts and
    exact ppm shares (integer division), the PSI monitoring shape
    upstream of the log."""
    from netflix_data_ingestion_spark.operators.drift import drift_report

    orders = _t(spark, sf_dir, "orders")
    ref = orders.filter(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    cur = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    return drift_report(ref, cur, "o_totalprice", bins=10, scale=100).orderBy(
        "bin"
    )


ORACLE_PRICE_DRIFT = """
WITH refv AS (
  SELECT round(o_totalprice * 100)::BIGINT AS v FROM orders
  WHERE o_orderdate < TIMESTAMP '1999-01-01' AND o_totalprice IS NOT NULL
),
curv AS (
  SELECT round(o_totalprice * 100)::BIGINT AS v FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_totalprice IS NOT NULL
),
r1 AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM refv
),
qrow AS (
  SELECT q, MAX(CASE WHEN rn = CEIL(q * n) THEN v END) AS vv
  FROM r1, (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q)
  GROUP BY q
),
cuts AS (SELECT list(vv ORDER BY q) AS cs FROM qrow),
rb AS (
  SELECT 1 + len(list_filter(cs, c -> v > c)) AS bin, COUNT(*)::BIGINT AS ref_n
  FROM refv, cuts GROUP BY 1
),
cb AS (
  SELECT 1 + len(list_filter(cs, c -> v > c)) AS bin, COUNT(*)::BIGINT AS cur_n
  FROM curv, cuts GROUP BY 1
),
b AS (
  SELECT bin, coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
  FROM rb FULL JOIN cb USING (bin)
),
t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM b)
SELECT bin,
       CASE WHEN bin > 1 THEN cs[bin - 1] END AS lo_units,
       ref_n, cur_n,
       CAST(CASE WHEN rt > 0 THEN (ref_n * 1000000) // rt END AS BIGINT)
         AS ref_ppm,
       CAST(CASE WHEN ct > 0 THEN (cur_n * 1000000) // ct END AS BIGINT)
         AS cur_ppm,
       CAST(abs(CASE WHEN rt > 0 THEN (ref_n * 1000000) // rt END
           - CASE WHEN ct > 0 THEN (cur_n * 1000000) // ct END) AS BIGINT)
         AS delta_ppm
FROM b, t, cuts
ORDER BY bin
"""


def q_part_name_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/fuzzy.resolve_entities: the entity-resolution ladder —
    length-band blocking + Levenshtein<=2 verify, connected components
    over the match graph (transitive closure is the ER semantics), min
    name as the golden-record id; singletons are their own entity."""
    from netflix_data_ingestion_spark.operators.fuzzy import (
        resolve_entities,
    )

    part = _t(spark, sf_dir, "part")
    return resolve_entities(part, "p_name", max_dist=2).orderBy("name")


ORACLE_PART_ENTITIES = """
WITH RECURSIVE
names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
pairs AS (
  SELECT a.name AS na, b.name AS nb
  FROM names a JOIN names b ON a.name < b.name
  WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2
),
edges AS (SELECT na AS u, nb AS v FROM pairs
          UNION ALL SELECT nb, na FROM pairs),
reach(node, lbl) AS (
  SELECT name, name FROM names
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
comp AS (SELECT node AS name, MIN(lbl) AS entity_id FROM reach GROUP BY 1),
sizes AS (SELECT entity_id, COUNT(*)::BIGINT AS entity_size
          FROM comp GROUP BY 1)
SELECT c.name, c.entity_id, s.entity_size,
       c.name = c.entity_id AS is_canonical
FROM comp c JOIN sizes s USING (entity_id)
ORDER BY name
"""


ORACLE_FUZZY_PAIRS = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name)::BIGINT AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2
ORDER BY name_a, name_b
"""


def q_customer_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.pagerank: 2 fixed-point power-iteration rounds
    over the bipartite customer->supplier order graph (distinct edges
    from orders x lineitem; suppliers are dangling sinks)."""
    from netflix_data_ingestion_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    return pagerank(edges, "src", "dst", iters=2).orderBy("node")


def _pagerank_oracle(
    iters: int = 2, damping: float = 0.85, scale: int = 1_000_000
) -> str:
    base = int(round((1.0 - damping) * scale))
    parts = [
        f"""
WITH e AS (
  SELECT DISTINCT 'c' || o.o_custkey AS s, 's' || l.l_suppkey AS d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
outdeg AS (SELECT s, count(*)::BIGINT AS deg FROM e GROUP BY s),
pr0 AS (SELECT node, {scale}::BIGINT AS pr FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
c{i} AS (
  SELECT e.d AS node,
         sum(round(p.pr::DOUBLE / o.deg)::BIGINT)::BIGINT AS cin
  FROM e JOIN pr{i - 1} p ON p.node = e.s JOIN outdeg o ON o.s = e.s
  GROUP BY e.d
),
pr{i} AS (
  SELECT n.node,
         ({base} + round({damping}::DOUBLE *
                         coalesce(c.cin, 0)::DOUBLE)::BIGINT)::BIGINT AS pr
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, pr FROM pr{iters} ORDER BY node")
    return "".join(parts)


ORACLE_PAGERANK = _pagerank_oracle()


def q_customer_supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.label_propagation: 3 synchronous LPA rounds over
    the bipartite customer->supplier order graph — most-frequent
    neighbor label, smallest-label tie-break; fixed rounds make the
    iterative algorithm bit-exact against the unrolled SQL oracle."""
    from netflix_data_ingestion_spark.operators.graph import label_propagation

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return label_propagation(edges, "src", "dst", rounds=3).orderBy("node")


def q_lineitem_salt_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skew.salt_advisor: suppliers whose lineitem share would
    overload one shuffle task at a 200-row target (test-scale policy
    knob) with the exact ceil(n/target) salt factor to feed
    `with_salt` — diagnosis-to-remedy closure of the skew family."""
    from netflix_data_ingestion_spark.operators.skew import salt_advisor

    li = _t(spark, sf_dir, "lineitem")
    return salt_advisor(
        li, ["l_suppkey"], target_rows_per_task=200, min_factor=2
    ).orderBy("l_suppkey")


ORACLE_SALT_ADVICE = """
WITH c AS (
  SELECT l_suppkey, COUNT(*)::BIGINT AS n FROM lineitem GROUP BY 1
)
SELECT l_suppkey, n,
       ((n + 199) // 200)::INT AS salt_factor
FROM c WHERE ((n + 199) // 200) >= 2
ORDER BY l_suppkey
"""


def q_orders_price_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/encode.standardize_by_train: z-scores for EVERY order
    fit on the 80% md5-hash train split only — the leakage-safe scaler;
    exact decimal train moments, one sqrt + one division, round 6."""
    from netflix_data_ingestion_spark.operators.encode import (
        standardize_by_train,
    )
    from netflix_data_ingestion_spark.operators.split import hash_split

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    split = hash_split(
        orders, "o_orderkey", {"train": 0.8, "test": 0.2}, salt="v1"
    )
    return standardize_by_train(
        split, "split", "o_totalprice", scale=100
    ).orderBy("o_orderkey")


ORACLE_PRICE_STANDARDIZED = """
WITH f AS (
  SELECT o_orderkey, o_totalprice,
         ('0x' || substr(md5('v1|' || o_orderkey::VARCHAR), 1, 8))
           ::UBIGINT::DOUBLE / 4294967296.0 AS frac,
         round(o_totalprice * 100)::BIGINT AS v
  FROM orders
),
s AS (
  SELECT o_orderkey, o_totalprice, v,
         CASE WHEN frac < 0.8 THEN 'train' ELSE 'test' END AS split
  FROM f
),
m AS (
  SELECT COUNT(*)::HUGEINT AS n, SUM(v::HUGEINT) AS sm,
         SUM(v::HUGEINT * v) AS q
  FROM s WHERE split = 'train' AND v IS NOT NULL
)
SELECT s.o_orderkey, s.split, s.o_totalprice,
       CASE WHEN s.v IS NOT NULL AND m.n > 1 AND (m.n * m.q) > (m.sm * m.sm)
            THEN ROUND(
              (s.v::DOUBLE - m.sm::DOUBLE / m.n::DOUBLE)
              / sqrt((m.n * m.q - m.sm * m.sm)::DOUBLE
                     / (m.n * (m.n - 1))::DOUBLE), 6)
       END AS value_scaled
FROM s, m
ORDER BY o_orderkey
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month; per (cohort, age-in-months) — active customers, revenue,
    cumulative revenue, and cumulative revenue per cohort member
    (integer cents until one final division).  The growth-analytics
    twin of `user_retention_cohorts` (which counts heads; this follows
    the money)."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first = om.groupBy("o_custkey").agg(F.min("month").alias("cohort_month"))
    sizes = first.groupBy("cohort_month").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    age = (
        (F.year("month") - F.year("cohort_month")) * 12
        + (F.month("month") - F.month("cohort_month"))
    ).cast("int")
    per_age = (
        om.join(first, "o_custkey")
        .groupBy("cohort_month", age.alias("age_months"))
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("active_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    wc = W.partitionBy("cohort_month").orderBy("age_months").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        per_age.withColumn(
            "cum_revenue_cents", F.sum("revenue_cents").over(wc)
        )
        .join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            "active_customers",
            "revenue_cents",
            "cum_revenue_cents",
            # exact integer micro-cents per member: ROUND(quotient, 6)
            # differs between engines in the last ulp at sf0.1 (observed)
            F.expr(
                "(cum_revenue_cents * 1000000) div cohort_size"
            ).alias("cum_revenue_micro_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


ORACLE_COHORT_LTV = """
WITH om AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
),
first AS (SELECT o_custkey, MIN(month) AS cohort_month FROM om GROUP BY 1),
sizes AS (SELECT cohort_month, COUNT(*)::BIGINT AS cohort_size
          FROM first GROUP BY 1),
per_age AS (
  SELECT f.cohort_month,
         ((year(o.month) - year(f.cohort_month)) * 12
          + (month(o.month) - month(f.cohort_month)))::INT AS age_months,
         COUNT(DISTINCT o.o_custkey)::BIGINT AS active_customers,
         SUM(o.cents)::BIGINT AS revenue_cents
  FROM om o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT *, SUM(revenue_cents) OVER (PARTITION BY cohort_month
             ORDER BY age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_revenue_cents
  FROM per_age
)
SELECT c.cohort_month, c.age_months, c.active_customers, c.revenue_cents,
       c.cum_revenue_cents,
       (c.cum_revenue_cents * 1000000) // s.cohort_size
         AS cum_revenue_micro_per_customer
FROM cum c JOIN sizes s USING (cohort_month)
ORDER BY cohort_month, age_months
"""


def q_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact (Kimball): one row per order carrying
    its milestone timeline — order date, first/last ship, lines shipped
    vs total — with integer day lags; the milestone-tracking table
    UPDATE-heavy warehouses model exactly this way, built here as one
    grouped pass + broadcast-joined order header.  Orders with no lines
    yet are excluded (inner join) — the snapshot row is born with its
    first milestone; the orphan audit is `orphan_lineitems`' job."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count("*").cast("long").alias("n_lines"),
        F.count(F.when(F.col("l_linestatus") == "F", 1))
        .cast("long")
        .alias("n_lines_shipped"),
    )
    return (
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus")
        .join(per_order, "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderstatus",
            "first_ship",
            "last_ship",
            "n_lines",
            "n_lines_shipped",
            F.datediff("first_ship", "o_orderdate")
            .cast("int")
            .alias("days_to_first_ship"),
            F.datediff("last_ship", "first_ship")
            .cast("int")
            .alias("ship_window_days"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_ORDER_LIFECYCLE = """
WITH per_order AS (
  SELECT l_orderkey AS o_orderkey,
         MIN(l_shipdate) AS first_ship,
         MAX(l_shipdate) AS last_ship,
         COUNT(*)::BIGINT AS n_lines,
         COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END)::BIGINT
           AS n_lines_shipped
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderdate, o.o_orderstatus,
       p.first_ship, p.last_ship,
       p.n_lines, p.n_lines_shipped,
       date_diff('day', o.o_orderdate, p.first_ship)::INT
         AS days_to_first_ship,
       date_diff('day', p.first_ship, p.last_ship)::INT
         AS ship_window_days
FROM orders o JOIN per_order p USING (o_orderkey)
ORDER BY o_orderkey
"""


def q_customer_supplier_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.bfs_hops: exact hop distances from customer c1
    over the bipartite order graph, 4 fixed rounds (even hops =
    customers, odd = suppliers); nodes farther than 4 hops absent —
    the supply-chain blast-radius primitive."""
    from netflix_data_ingestion_spark.operators.graph import bfs_hops

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    sources = orders.sparkSession.createDataFrame(
        [("c1",)], "node string"
    )
    return bfs_hops(edges, "src", "dst", sources=sources, rounds=4).orderBy(
        "node"
    )


def _bfs_oracle(rounds: int = 4) -> str:
    parts = [
        """
WITH e AS (
  SELECT DISTINCT 'c' || o.o_custkey AS s, 's' || l.l_suppkey AS d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
d0 AS (SELECT 'c1' AS node, 0 AS hops)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT node, MIN(hops)::INT AS hops FROM (
    SELECT node, hops FROM d{i - 1}
    UNION ALL
    SELECT e.d AS node, p.hops + 1 FROM e JOIN d{i - 1} p ON p.node = e.s
    UNION ALL
    SELECT e.s AS node, p.hops + 1 FROM e JOIN d{i - 1} p ON p.node = e.d
  ) GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, hops FROM d{rounds} ORDER BY node")
    return "".join(parts)


ORACLE_BFS_HOPS = _bfs_oracle()


def _lpa_oracle(rounds: int = 3) -> str:
    parts = [
        """
WITH e AS (
  SELECT DISTINCT 'c' || o.o_custkey AS s, 's' || l.l_suppkey AS d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
l0 AS (SELECT node, node AS lbl FROM nodes)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
n{i} AS (
  SELECT e.s AS node, l.lbl FROM e JOIN l{i - 1} l ON l.node = e.d
  UNION ALL
  SELECT e.d AS node, l.lbl FROM e JOIN l{i - 1} l ON l.node = e.s
),
c{i} AS (SELECT node, lbl, COUNT(*) AS c FROM n{i} GROUP BY 1, 2),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"\nSELECT node, lbl AS community FROM l{rounds} ORDER BY node"
    )
    return "".join(parts)


ORACLE_LPA = _lpa_oracle()


def q_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/expectations.run_expectations: six declarative checks
    (nullability, uniqueness, range, set, regex, referential) compiled
    into one aggregation pass + one anti-join — the reference's
    hand-rolled safety validation as data."""
    from netflix_data_ingestion_spark.operators import expectations as ex

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    report = ex.run_expectations(
        orders,
        [
            ex.expect_not_null("o_orderkey"),
            ex.expect_unique("o_orderkey"),
            ex.expect_in_range("o_totalprice", 0, 600_000),
            ex.expect_in_set("o_orderstatus", ["O", "F", "P"]),
            ex.expect_regex("o_orderpriority", "^[1-5]-"),
            ex.expect_foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )
    return report.orderBy("check", "column")


_DL_RUN_SEQ = [0]


def q_ratings_dead_letters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERMISSIVE-reader + CHECK-validation control plane driven
    end-to-end through the driver gate: render a deliberately-dirtied
    ratings CSV from orders (key corrupted to a non-numeric token when
    o_orderkey%13==0 -> PERMISSIVE corrupt record; rating empty when
    %11==0 -> NULL int; otherwise rating = o_orderkey%8, so 0/6/7 are
    in-schema but CHECK-violating), write it as real files, scan it
    back through sources.readers.read_csv (declared schema, PERMISSIVE,
    columnNameOfCorruptRecord), split with split_dead_letters, then run
    schemas.validate(..., "fact_ratings") on the clean side.  The
    summary row reconciles the whole ladder exactly:
    total == dead_letters + valid + invalid, and NULL ratings land on
    the invalid side (validate's three-valued-logic coalesce).

    Mirrors the reference's two-tier safety surface (PERMISSIVE parse
    accounting + DB CHECK constraints, etl_pipeline_spark.py:1163-1172,
    schema.sql CHECKs) as one hash-checked row.

    Plan: one narrow projection + distributed text write, one CSV scan,
    then three 1-row aggregates crossJoined (constant output)."""
    import os
    import tempfile

    from netflix_data_ingestion_spark import schemas
    from netflix_data_ingestion_spark.sources.readers import (
        read_csv,
        split_dead_letters,
    )

    k = F.col("o_orderkey")
    lines = (
        _t(spark, sf_dir, "orders")
        .select(
            F.concat_ws(
                ",",
                F.when(k % 13 == 0, F.concat(F.lit("X"), k.cast("string")))
                .otherwise(k.cast("string")),
                F.col("o_custkey").cast("string"),
                # empty string, not NULL: concat_ws SKIPS nulls, which
                # would shift fields left; an empty CSV field reads as
                # a NULL int, which is the shape under test
                F.when(k % 11 == 0, F.lit(""))
                .otherwise((k % 8).cast("string")),
                F.col("o_orderdate").cast("string"),
            ).alias("value")
        )
    )
    _DL_RUN_SEQ[0] += 1
    out = os.path.join(
        tempfile.gettempdir(),
        f"ratings_dead_letters_{os.getpid()}_{_DL_RUN_SEQ[0]}",
    )
    lines.write.mode("overwrite").text(out)
    raw = read_csv(
        spark,
        out,
        "customer_id bigint, helper_key bigint, rating int, rated_at date",
        header=False,
    )
    clean, dead = split_dead_letters(raw)
    valid, invalid = schemas.validate(clean, "fact_ratings")
    dead_agg = dead.agg(F.count(F.lit(1)).alias("dead_letters"))
    val_agg = valid.agg(
        F.count(F.lit(1)).alias("valid_rows"),
        F.sum("rating").cast("long").alias("sum_valid_rating"),
    )
    inv_agg = invalid.agg(
        F.count(F.lit(1)).alias("invalid_rows"),
        F.sum(F.col("rating").isNull().cast("long"))
        .cast("long")
        .alias("null_rating_rows"),
    )
    # 1-row report aggregates crossJoined — constant output, same
    # sanctioned shape as orders_expectations / dedup_lsh_recall
    return dead_agg.crossJoin(val_agg).crossJoin(inv_agg).select(
        "dead_letters",
        "valid_rows",
        "sum_valid_rating",
        "invalid_rows",
        "null_rating_rows",
    )


ORACLE_RATINGS_DEAD_LETTERS = """
WITH cls AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 13 = 0) AS dead,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE (o_orderkey % 8)::INT END AS rating
  FROM orders
)
SELECT
  (SELECT count(*) FROM cls WHERE dead)::BIGINT AS dead_letters,
  (SELECT count(*) FROM cls
     WHERE NOT dead AND rating BETWEEN 1 AND 5)::BIGINT AS valid_rows,
  (SELECT sum(rating) FROM cls
     WHERE NOT dead AND rating BETWEEN 1 AND 5)::BIGINT AS sum_valid_rating,
  (SELECT count(*) FROM cls
     WHERE NOT dead
       AND NOT coalesce(rating BETWEEN 1 AND 5, FALSE))::BIGINT
    AS invalid_rows,
  (SELECT count(*) FROM cls
     WHERE NOT dead AND rating IS NULL)::BIGINT AS null_rating_rows
"""


def q_calendar_check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schemas.check_report driven through the driver gate: per-rule
    CHECK-violation counts over a deliberately-dirtied dim_date-shaped
    frame (every dirtying condition keyed on o_orderkey so the DuckDB
    oracle replays it exactly: month +12 when %17==0, day +31 when
    %19==0, quarter +4 when %23==0, day_of_week forced to -1 when
    %29==0, else o_orderkey%7).  Answers the operational question the
    reference's DB-side CHECK constraints answer via error logs —
    WHICH constraint fails and how often — without aborting the load.

    Plan: ONE aggregation pass (all four rules fused into a single
    map-side-combinable agg), then a constant-height stack."""
    from netflix_data_ingestion_spark import schemas

    k = F.col("o_orderkey")
    frame = _t(spark, sf_dir, "orders").select(
        (F.month("o_orderdate")
         + F.when(k % 17 == 0, 12).otherwise(0)).alias("month"),
        (F.dayofmonth("o_orderdate")
         + F.when(k % 19 == 0, 31).otherwise(0)).alias("day"),
        (F.quarter("o_orderdate")
         + F.when(k % 23 == 0, 4).otherwise(0)).alias("quarter"),
        F.when(k % 29 == 0, F.lit(-1).cast("long"))
        .otherwise(k % 7)
        .alias("day_of_week"),
    )
    return schemas.check_report(frame, "dim_date").orderBy("rule")


ORACLE_CALENDAR_CHECK_REPORT = """
WITH f AS (
  SELECT month(o_orderdate)
           + CASE WHEN o_orderkey % 17 = 0 THEN 12 ELSE 0 END AS m,
         day(o_orderdate)
           + CASE WHEN o_orderkey % 19 = 0 THEN 31 ELSE 0 END AS d,
         quarter(o_orderdate)
           + CASE WHEN o_orderkey % 23 = 0 THEN 4 ELSE 0 END AS q,
         CASE WHEN o_orderkey % 29 = 0 THEN -1
              ELSE o_orderkey % 7 END AS dw
  FROM orders
)
SELECT rule, violations, rows_scanned FROM (
  SELECT 'month_range' AS rule,
         (count(*) FILTER (WHERE NOT coalesce(m BETWEEN 1 AND 12,
                                              FALSE)))::BIGINT AS violations,
         count(*)::BIGINT AS rows_scanned
  FROM f
  UNION ALL
  SELECT 'day_range',
         (count(*) FILTER (WHERE NOT coalesce(d BETWEEN 1 AND 31,
                                              FALSE)))::BIGINT,
         count(*)::BIGINT
  FROM f
  UNION ALL
  SELECT 'quarter_range',
         (count(*) FILTER (WHERE NOT coalesce(q BETWEEN 1 AND 4,
                                              FALSE)))::BIGINT,
         count(*)::BIGINT
  FROM f
  UNION ALL
  SELECT 'day_of_week_range',
         (count(*) FILTER (WHERE NOT coalesce(dw BETWEEN 0 AND 6,
                                              FALSE)))::BIGINT,
         count(*)::BIGINT
  FROM f
)
ORDER BY rule
"""


ORACLE_EXPECTATIONS = """
WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM orders),
checks AS (
  SELECT 'not_null' AS "check", 'o_orderkey' AS "column",
         (SELECT count(*) FILTER (WHERE o_orderkey IS NULL) FROM orders)::BIGINT AS v
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)::BIGINT
  UNION ALL
  SELECT 'in_range', 'o_totalprice',
         (SELECT count(*) FILTER (WHERE coalesce(o_totalprice < 0 OR o_totalprice > 600000, FALSE)) FROM orders)::BIGINT
  UNION ALL
  SELECT 'in_set', 'o_orderstatus',
         (SELECT count(*) FILTER (WHERE coalesce(o_orderstatus NOT IN ('O','F','P'), FALSE)) FROM orders)::BIGINT
  UNION ALL
  SELECT 'regex', 'o_orderpriority',
         (SELECT count(*) FILTER (WHERE coalesce(NOT regexp_matches(o_orderpriority, '^[1-5]-'), FALSE)) FROM orders)::BIGINT
  UNION ALL
  SELECT 'foreign_key', 'o_custkey',
         (SELECT count(*) FROM orders o
          WHERE o.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT
)
SELECT "check", "column", n.n_rows, v AS n_violations, v = 0 AS passed
FROM checks, n
ORDER BY "check", "column"
"""


def q_orders_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/zorder.zorder_key: Morton keys interleaving customer
    and price-cents bucket indices (8 bits each) — the layout key a
    Z-ORDER clustered write sorts by so parquet min/max stats prune on
    EITHER column."""
    from netflix_data_ingestion_spark.operators.zorder import zorder_key

    orders = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("price_cents"),
        )
    )
    return (
        zorder_key(orders, ["o_custkey", "price_cents"], bits=8)
        .select("o_orderkey", "zkey")
        .orderBy("o_orderkey")
    )


def _zorder_oracle() -> str:
    from netflix_data_ingestion_spark.operators.zorder import duckdb_zkey_sql

    expr = duckdb_zkey_sql(["o_custkey", "price_cents"], bits=8)
    return f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         round(o_totalprice * 100)::BIGINT AS price_cents
  FROM orders
),
bounds AS (
  SELECT min(o_custkey::BIGINT) AS __min_o_custkey,
         max(o_custkey::BIGINT) AS __max_o_custkey,
         min(price_cents) AS __min_price_cents,
         max(price_cents) AS __max_price_cents
  FROM base
)
SELECT o_orderkey, {expr}::BIGINT AS zkey
FROM base, bounds
ORDER BY o_orderkey
"""


ORACLE_ZORDER = _zorder_oracle()


def q_order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/outliers.zscore_outliers: orders whose total price sits
    more than 1.7 population sigmas (rational 17/10 — the inequality is
    exact-integer, no float mean/stddev) from their priority group's
    mean.  The synthetic prices are ~uniform (max |z| ~ 1.77), so 1.7
    flags a real tail without flagging everything."""
    from netflix_data_ingestion_spark.operators.outliers import (
        zscore_outliers,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return (
        zscore_outliers(
            orders, ["o_orderpriority"], "o_totalprice", z_num=17, z_den=10
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            "value_units",
            "group_n",
            "is_high",
        )
        .orderBy("o_orderkey")
    )


ORACLE_PRICE_OUTLIERS = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         round(o_totalprice * 100)::BIGINT AS v
  FROM orders
),
stats AS (
  SELECT o_orderpriority,
         count(*)::HUGEINT AS n,
         sum(v::HUGEINT) AS s,
         sum(v::HUGEINT * v::HUGEINT) AS q
  FROM base GROUP BY 1
)
SELECT b.o_orderkey, b.o_orderpriority,
       b.v AS value_units,
       n::BIGINT AS group_n,
       (n * b.v::HUGEINT - s) > 0 AS is_high
FROM base b JOIN stats USING (o_orderpriority)
WHERE (n * b.v::HUGEINT - s) * (n * b.v::HUGEINT - s) * 100
      > 289 * (n * q - s * s)
ORDER BY o_orderkey
"""


def q_lineitem_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bloomjoin.bloom_semi_join: Bloom-prefiltered semi-join
    of lineitem against suppliers in one nation, then a per-supplier
    rollup.  The oracle is the plain semi-join — the Bloom pass must be
    semantically invisible (no false negatives; positives removed by
    the exact join)."""
    from netflix_data_ingestion_spark.operators.bloomjoin import (
        bloom_semi_join,
    )

    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 5)
    kept = bloom_semi_join(
        lineitem, "l_suppkey", supplier, "s_suppkey", n_bits=1 << 16
    )
    return (
        kept.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("l_suppkey")
    )


ORACLE_BLOOM_SEMI = """
SELECT l_suppkey,
       count(*)::BIGINT AS n_items,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 5)
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


# ---------------------------------------------------------------------------
# dense_rank: top price LEVELS per brand with ties kept — the tie-aware
# twin of part_revenue_rank_in_brand's row_number (which cuts ties
# arbitrarily; a "top 3 price points" question needs every part AT each
# point)
# ---------------------------------------------------------------------------


def q_brand_top_price_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        part.withColumn("price_rank", F.dense_rank().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank")
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


ORACLE_TOP_PRICE_LEVELS = """
SELECT p_brand, p_partkey, p_retailprice, price_rank
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         DENSE_RANK() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC)::INT AS price_rank
  FROM part
)
WHERE price_rank <= 3
ORDER BY p_brand, price_rank, p_partkey
"""


# ---------------------------------------------------------------------------
# Incremental join maintenance: the delta of orders ⋈ lineitem under
# append-only increments.  The oracle computes new⋈ EXCEPT ALL old⋈ —
# i.e. it verifies the IVM IDENTITY (delta formula == recompute diff),
# not just the implementation against itself.
# ---------------------------------------------------------------------------


def q_orders_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/merge.incremental_join_delta on a deterministic split:
    orders increment = keys % 10 == 0, lineitem increment = keys % 7 ==
    0, so all three delta terms (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB at % 70 == 0) are
    exercised."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_custkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_linenumber", "l_quantity"
    )
    out = merge.incremental_join_delta(
        orders.filter(F.col("okey") % 10 != 0),
        orders.filter(F.col("okey") % 10 == 0),
        li.filter(F.col("okey") % 7 != 0),
        li.filter(F.col("okey") % 7 == 0),
        ["okey"],
    )
    return out.select(
        "okey", "l_linenumber", "o_custkey", "l_quantity"
    ).orderBy("okey", "l_linenumber")


ORACLE_JOIN_DELTA = """
WITH o AS (SELECT o_orderkey AS okey, o_custkey FROM orders),
l AS (SELECT l_orderkey AS okey, l_linenumber, l_quantity FROM lineitem),
newj AS (
  SELECT o.okey, l.l_linenumber, o.o_custkey, l.l_quantity
  FROM o JOIN l USING (okey)
),
oldj AS (
  SELECT o.okey, l.l_linenumber, o.o_custkey, l.l_quantity
  FROM (SELECT * FROM o WHERE okey % 10 <> 0) o
  JOIN (SELECT * FROM l WHERE okey % 7 <> 0) l USING (okey)
)
SELECT okey, l_linenumber, o_custkey, l_quantity
FROM (SELECT * FROM newj EXCEPT ALL SELECT * FROM oldj)
ORDER BY okey, l_linenumber
"""


# ---------------------------------------------------------------------------
# Pseudonymization: salted md5 surrogates for identifier columns
# ---------------------------------------------------------------------------


def q_customer_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/redact.pseudonymize: c_name/c_phone replaced by salted
    md5 surrogates (joins and group-bys keep working; raw identifiers
    leave the dataset) — the structured-column companion to
    doc_pii_redact's free-text scrub."""
    from netflix_data_ingestion_spark.operators.redact import pseudonymize

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    return pseudonymize(cust, ["c_name"]).orderBy("c_custkey")


ORACLE_PSEUDONYMIZED = """
SELECT c_custkey,
       substring(md5('v1|' || c_name), 1, 16) AS c_name,
       c_nationkey, c_mktsegment
FROM customer
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt: wide metric columns -> long (metric, value) rows
# ---------------------------------------------------------------------------


def q_orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational melt via DataFrame.unpivot (the inverse of
    pivot_event_types): per-lineitem metric columns to long format — the
    shape metric stores and chart layers consume.  Narrow 1-to-k row
    expansion, no shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "discount", "tax"],
        "metric",
        "metric_value",
    ).orderBy("l_orderkey", "l_linenumber", "metric")


ORACLE_UNPIVOT = """
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
       l_quantity::DOUBLE AS metric_value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount::DOUBLE FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', l_tax::DOUBLE FROM lineitem
ORDER BY l_orderkey, l_linenumber, metric
"""


# ---------------------------------------------------------------------------
# percent_rank within group: balance percentile inside market segment
# ---------------------------------------------------------------------------


def q_customer_balance_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank of account balance WITHIN market segment (the
    partitioned form — per-key windows distribute, unlike the global
    ntile query's sanctioned single pass).  (rank-1)/(n-1) is one
    int/int double division — bit-stable."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("balance_pr", F.percent_rank().over(w))
        .select("c_custkey", "c_mktsegment", "c_acctbal", "balance_pr")
        .orderBy("c_custkey")
    )


ORACLE_BALANCE_PERCENTILE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       percent_rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal ASC, c_custkey ASC)
         AS balance_pr
FROM customer
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Skyline: per-brand Pareto frontier (cheapest price / largest size)
# ---------------------------------------------------------------------------


def q_part_skyline_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/skyline.skyline_2d: parts no brand-mate beats on both
    (lower price, larger size) — prefix-max over distinct price points,
    no row sort, no quadratic self-join.  The oracle is the NOT EXISTS
    dominance definition, proving the construction semantically."""
    from netflix_data_ingestion_spark.operators.skyline import skyline_2d

    part = _t(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(
        part, ["p_brand"], "p_retailprice", "p_size"
    ).orderBy("p_brand", "p_partkey")


ORACLE_SKYLINE = """
SELECT p_brand, p_partkey, p_retailprice, p_size
FROM part a
WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part b
    WHERE b.p_brand = a.p_brand
      AND b.p_retailprice <= a.p_retailprice
      AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
  )
ORDER BY p_brand, p_partkey
"""


# ---------------------------------------------------------------------------
# k-anonymity: suppress quasi-identifier combinations shared by < k rows
# ---------------------------------------------------------------------------


def q_customer_k_anonymous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/redact.k_anonymity_suppress on (nation, segment): rare
    combinations are nulled — the release gate after pseudonymize."""
    from netflix_data_ingestion_spark.operators.redact import (
        k_anonymity_suppress,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return k_anonymity_suppress(
        cust, ["c_nationkey", "c_mktsegment"], k=10
    ).orderBy("c_custkey")


ORACLE_K_ANONYMOUS = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS group_size
  FROM customer GROUP BY 1, 2
)
SELECT c.c_custkey,
       CASE WHEN g.group_size >= 10 THEN c.c_nationkey END AS c_nationkey,
       CASE WHEN g.group_size >= 10 THEN c.c_mktsegment END AS c_mktsegment,
       g.group_size,
       (g.group_size < 10)::INT AS suppressed
FROM customer c
JOIN g ON g.c_nationkey = c.c_nationkey
      AND g.c_mktsegment = c.c_mktsegment
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary quartiles per customer
# ---------------------------------------------------------------------------


def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM scoring: per ordering customer, quartile of last
    order date (recency — 4 = most recent), order count (frequency),
    and rounded total spend (monetary); segment = 100*r + 10*f + m.
    Quartiles are exact distributed ntiles (operators/keys.ntile_ranged
    — range partition + local rank + broadcast offsets; identical
    semantics to the global window, no single-task sort), ties broken
    by custkey for cross-engine determinism."""
    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    scored = per_cust
    for out, order in [
        ("r", [F.col("last_order").asc(), F.col("c_custkey").asc()]),
        ("f", [F.col("n_orders").asc(), F.col("c_custkey").asc()]),
        ("m", [F.col("total_spend").asc(), F.col("c_custkey").asc()]),
    ]:
        scored = ntile_ranged(scored, order, 4, out)
    return scored.select(
        "c_custkey",
        "last_order",
        "n_orders",
        "total_spend",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int")
        .alias("rfm_segment"),
    ).orderBy("c_custkey")


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey AS c_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*)::BIGINT AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS total_spend
  FROM orders GROUP BY 1
)
SELECT c_custkey, last_order, n_orders, total_spend,
       (NTILE(4) OVER (ORDER BY last_order ASC, c_custkey ASC) * 100
        + NTILE(4) OVER (ORDER BY n_orders ASC, c_custkey ASC) * 10
        + NTILE(4) OVER (ORDER BY total_spend ASC, c_custkey ASC))::INT
         AS rfm_segment
FROM per_cust
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Exact Pearson correlation matrix over lineitem numeric features
# ---------------------------------------------------------------------------


def q_lineitem_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.feature_correlations: pairwise Pearson over
    (quantity, extendedprice, discount) with DECIMAL(38,0) exact
    moments in ONE pass; only the final ratio is float (fixed op
    order, round 6)."""
    from netflix_data_ingestion_spark.operators.profile import (
        feature_correlations,
    )

    li = _t(spark, sf_dir, "lineitem")
    return feature_correlations(
        li, ["l_quantity", "l_extendedprice", "l_discount"], scale=100
    ).orderBy("col_a", "col_b")


ORACLE_FEATURE_CORR = """
WITH q AS (
  SELECT round(l_quantity * 100)::BIGINT AS v0,
         round(l_extendedprice * 100)::BIGINT AS v1,
         round(l_discount * 100)::BIGINT AS v2
  FROM lineitem
),
m AS (
  SELECT
    COUNT(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN 1 END)::HUGEINT AS n01,
    SUM(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v0 END)::HUGEINT AS sa01,
    SUM(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v1 END)::HUGEINT AS sb01,
    SUM(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v0::HUGEINT * v0 END) AS qa01,
    SUM(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v1::HUGEINT * v1 END) AS qb01,
    SUM(CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v0::HUGEINT * v1 END) AS p01,
    COUNT(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN 1 END)::HUGEINT AS n02,
    SUM(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN v0 END)::HUGEINT AS sa02,
    SUM(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN v2 END)::HUGEINT AS sb02,
    SUM(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN v0::HUGEINT * v0 END) AS qa02,
    SUM(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN v2::HUGEINT * v2 END) AS qb02,
    SUM(CASE WHEN v0 IS NOT NULL AND v2 IS NOT NULL THEN v0::HUGEINT * v2 END) AS p02,
    COUNT(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN 1 END)::HUGEINT AS n12,
    SUM(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN v1 END)::HUGEINT AS sa12,
    SUM(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN v2 END)::HUGEINT AS sb12,
    SUM(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN v1::HUGEINT * v1 END) AS qa12,
    SUM(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN v2::HUGEINT * v2 END) AS qb12,
    SUM(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL THEN v1::HUGEINT * v2 END) AS p12
  FROM q
)
SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, n12::BIGINT AS n,
       ROUND((n12 * p12 - sa12 * sb12)::DOUBLE
             / sqrt((n12 * qa12 - sa12 * sa12)::DOUBLE
                    * (n12 * qb12 - sb12 * sb12)::DOUBLE), 6) AS corr
FROM m
UNION ALL
SELECT 'l_quantity', 'l_discount', n02::BIGINT,
       ROUND((n02 * p02 - sa02 * sb02)::DOUBLE
             / sqrt((n02 * qa02 - sa02 * sa02)::DOUBLE
                    * (n02 * qb02 - sb02 * sb02)::DOUBLE), 6)
FROM m
UNION ALL
SELECT 'l_quantity', 'l_extendedprice', n01::BIGINT,
       ROUND((n01 * p01 - sa01 * sb01)::DOUBLE
             / sqrt((n01 * qa01 - sa01 * sa01)::DOUBLE
                    * (n01 * qb01 - sb01 * sb01)::DOUBLE), 6)
FROM m
ORDER BY col_a, col_b
"""


# ---------------------------------------------------------------------------
# Closed-form OLS: extendedprice regressed on quantity, exact moments
# ---------------------------------------------------------------------------


def q_price_quantity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.ols_fit: least-squares line through
    (l_quantity, l_extendedprice) — one combinable moment pass, two
    float divisions (the intercept reuses the ROUNDED slope so both
    engines replay the identical sequence)."""
    from netflix_data_ingestion_spark.operators.profile import ols_fit

    li = _t(spark, sf_dir, "lineitem")
    return ols_fit(li, "l_quantity", "l_extendedprice", scale=100)


ORACLE_OLS = """
WITH q AS (
  SELECT round(l_quantity * 100)::BIGINT AS vx,
         round(l_extendedprice * 100)::BIGINT AS vy
  FROM lineitem
),
m AS (
  SELECT COUNT(CASE WHEN vx IS NOT NULL AND vy IS NOT NULL THEN 1 END)::HUGEINT AS n,
         SUM(CASE WHEN vx IS NOT NULL AND vy IS NOT NULL THEN vx END)::HUGEINT AS sx,
         SUM(CASE WHEN vx IS NOT NULL AND vy IS NOT NULL THEN vy END)::HUGEINT AS sy,
         SUM(CASE WHEN vx IS NOT NULL AND vy IS NOT NULL THEN vx::HUGEINT * vx END) AS qx,
         SUM(CASE WHEN vx IS NOT NULL AND vy IS NOT NULL THEN vx::HUGEINT * vy END) AS p
  FROM q
),
s AS (
  SELECT n, sx, sy,
         ROUND((n * p - sx * sy)::DOUBLE
               / (n * qx - sx * sx)::DOUBLE, 6) AS slope
  FROM m
)
SELECT n::BIGINT AS n, slope,
       ROUND((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE / 100, 6)
         AS intercept
FROM s
"""


# ---------------------------------------------------------------------------
# GK-sketch quantiles with a bounded-error contract: the mergeable
# approximate-quantile sketch (Greenwald-Khanna, SIGMOD 2001 — Spark's
# percentile_approx) proven against exact distributed ground truth.
# Same oracle pattern as approx_distinct_users_daily: the contract
# output is the EXACT quantile (oracle-reproducible nearest-rank pick)
# plus a boolean asserting the sketch's pick lands within its published
# rank-error guarantee (eps = 1/accuracy), which absorbs the sketch's
# merge-order nondeterminism while still failing on a broken sketch.
# ---------------------------------------------------------------------------


def q_order_price_gk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/profile.exact_quantiles_ranged (distributed exact
    ranks) + percentile_approx(accuracy=100): per quantile the exact
    nearest-rank value in cents and whether the GK pick's rank span is
    within eps*n of the target rank."""
    import math

    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles_ranged,
    )

    qs = (0.25, 0.5, 0.75, 0.9)
    prices = (
        read_table(spark, sf_dir, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
        )
        .where(F.col("v").isNotNull())
    )
    exact_row = exact_quantiles_ranged(prices, "v", qs).first()
    avs = prices.agg(
        F.percentile_approx("v", list(qs), 100).alias("av")
    ).first()["av"]
    spans = prices.agg(
        F.count("*").alias("n"),
        *[
            F.sum((F.col("v") <= int(a)).cast("long")).alias(f"le{i}")
            for i, a in enumerate(avs)
        ],
        *[
            F.sum((F.col("v") < int(a)).cast("long")).alias(f"lt{i}")
            for i, a in enumerate(avs)
        ],
    ).first()
    n = spans["n"]
    tol = n // 100 + 1  # >= ceil(eps * n) at accuracy=100
    rows = []
    for i, q in enumerate(qs):
        target = max(1, math.ceil(q * n))
        lo, hi = spans[f"lt{i}"] + 1, spans[f"le{i}"]
        rows.append(
            (
                int(round(q * 100)),
                int(exact_row[f"p{int(round(q * 100))}"]),
                bool(lo - tol <= target <= hi + tol),
            )
        )
    return spark.createDataFrame(
        rows, "q_pct int, exact_cents long, gk_within_bound boolean"
    ).orderBy("q_pct")


ORACLE_GK_QUANTILES = """
WITH p AS (
  SELECT ROUND(o_totalprice * 100)::BIGINT AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
  FROM p
)
SELECT q_pct::INT AS q_pct, exact_cents, TRUE AS gk_within_bound
FROM (
  SELECT 25 AS q_pct,
         MAX(CASE WHEN rn = CEIL(0.25 * n) THEN v END) AS exact_cents FROM r
  UNION ALL
  SELECT 50, MAX(CASE WHEN rn = CEIL(0.5 * n) THEN v END) FROM r
  UNION ALL
  SELECT 75, MAX(CASE WHEN rn = CEIL(0.75 * n) THEN v END) FROM r
  UNION ALL
  SELECT 90, MAX(CASE WHEN rn = CEIL(0.9 * n) THEN v END) FROM r
) q
ORDER BY q_pct
"""


REGISTRY_EXTRA = {
    "order_price_gk_quantiles": (
        q_order_price_gk_quantiles,
        ORACLE_GK_QUANTILES,
    ),
    "orders_join_delta": (q_orders_join_delta, ORACLE_JOIN_DELTA),
    "part_skyline_by_brand": (q_part_skyline_by_brand, ORACLE_SKYLINE),
    "customer_k_anonymous": (q_customer_k_anonymous, ORACLE_K_ANONYMOUS),
    "customer_rfm_segments": (q_customer_rfm_segments, ORACLE_RFM),
    "lineitem_feature_corr": (q_lineitem_feature_corr, ORACLE_FEATURE_CORR),
    "price_quantity_ols": (q_price_quantity_ols, ORACLE_OLS),
    "customer_pseudonymized": (q_customer_pseudonymized, ORACLE_PSEUDONYMIZED),
    "orders_unpivot": (q_orders_unpivot, ORACLE_UNPIVOT),
    "customer_balance_percentile": (
        q_customer_balance_percentile,
        ORACLE_BALANCE_PERCENTILE,
    ),
    "brand_top_price_levels": (
        q_brand_top_price_levels,
        ORACLE_TOP_PRICE_LEVELS,
    ),
    "user_forget_audit": (
        q_user_forget_audit,
        ORACLE_FORGET_AUDIT,
    ),
    "events_seasonal_anomaly": (
        q_events_seasonal_anomaly,
        ORACLE_SEASONAL_ANOMALY,
    ),
    "order_price_mad_outliers": (
        q_order_price_mad_outliers,
        ORACLE_MAD_OUTLIERS,
    ),
    "customer_busy_periods": (q_customer_busy_periods, ORACLE_BUSY_PERIODS),
    "part_name_fuzzy_pairs": (q_part_name_fuzzy_pairs, ORACLE_FUZZY_PAIRS),
    "part_name_entities": (q_part_name_entities, ORACLE_PART_ENTITIES),
    "orders_price_drift": (q_orders_price_drift, ORACLE_PRICE_DRIFT),
    "events_burst_collapse": (q_events_burst_collapse, ORACLE_BURST_COLLAPSE),
    "orders_priority_encoding": (q_orders_priority_encoding, ORACLE_PRIORITY_ENCODING),
    "nation_revenue_share": (q_nation_revenue_share, ORACLE_NATION_SHARE),
    "lineitem_table_digest": (q_lineitem_table_digest, ORACLE_TABLE_DIGEST),
    "events_ab_report": (q_events_ab_report, ORACLE_AB_REPORT),
    "order_price_auc": (q_order_price_auc, ORACLE_PRICE_AUC),
    "order_class_report": (q_order_class_report, ORACLE_CLASS_REPORT),
    "events_twap_daily": (q_events_twap_daily, ORACLE_TWAP_DAILY),
    "part_abc_classes": (q_part_abc_classes, ORACLE_ABC_CLASSES),
    "events_cooldown_throttle": (
        q_events_cooldown_throttle,
        ORACLE_COOLDOWN_THROTTLE,
    ),
    "session_entry_conversion": (
        q_session_entry_conversion,
        ORACLE_SESSION_ENTRY,
    ),
    "customer_supplier_communities": (
        q_customer_supplier_communities,
        ORACLE_LPA,
    ),
    "customer_supplier_hops": (q_customer_supplier_hops, ORACLE_BFS_HOPS),
    "order_lifecycle": (q_order_lifecycle, ORACLE_ORDER_LIFECYCLE),
    "cohort_ltv": (q_cohort_ltv, ORACLE_COHORT_LTV),
    "lineitem_salt_advice": (q_lineitem_salt_advice, ORACLE_SALT_ADVICE),
    "orders_price_standardized": (
        q_orders_price_standardized,
        ORACLE_PRICE_STANDARDIZED,
    ),
    "customer_supplier_pagerank": (
        q_customer_supplier_pagerank,
        ORACLE_PAGERANK,
    ),
    "orders_expectations": (q_orders_expectations, ORACLE_EXPECTATIONS),
    "ratings_dead_letters": (
        q_ratings_dead_letters,
        ORACLE_RATINGS_DEAD_LETTERS,
    ),
    "calendar_check_report": (
        q_calendar_check_report,
        ORACLE_CALENDAR_CHECK_REPORT,
    ),
    "orders_zorder_key": (q_orders_zorder_key, ORACLE_ZORDER),
    "order_price_outliers": (q_order_price_outliers, ORACLE_PRICE_OUTLIERS),
    "lineitem_bloom_semi": (q_lineitem_bloom_semi, ORACLE_BLOOM_SEMI),
    "customer_merge_upsert": (q_customer_merge_upsert, ORACLE_MERGE_UPSERT),
    "customer_snapshot_diff": (q_customer_snapshot_diff, ORACLE_SNAPSHOT_DIFF),
    "daily_summary_incremental": (
        q_daily_summary_incremental,
        ORACLE_INCREMENTAL_AGG,
    ),
    "brand_quantity_salted": (q_brand_quantity_salted, ORACLE_BRAND_SALTED),
    "order_price_quantiles": (q_order_price_quantiles, ORACLE_PRICE_QUANTILES),
    "regional_revenue": (q_regional_revenue, ORACLE_REGIONAL_REVENUE),
    "user_event_gaps": (q_user_event_gaps, ORACLE_USER_GAPS),
    "customer_balance_quartiles": (
        q_customer_balance_quartiles,
        ORACLE_BALANCE_QUARTILES,
    ),
    "retained_customers_intersect": (
        q_retained_customers_intersect,
        ORACLE_RETAINED_INTERSECT,
    ),
    "orders_cube": (q_orders_cube, ORACLE_ORDERS_CUBE),
    "lineitem_grouping_sets": (
        q_lineitem_grouping_sets,
        ORACLE_LINEITEM_GROUPING_SETS,
    ),
    "customers_with_urgent_orders": (
        q_customers_with_urgent_orders,
        ORACLE_URGENT_SEMI,
    ),
    "lapsed_customers_except": (q_lapsed_customers_except, ORACLE_LAPSED_EXCEPT),
    "brand_priciest_part": (q_brand_priciest_part, ORACLE_BRAND_PRICIEST),
    "median_order_by_segment": (q_median_order_by_segment, ORACLE_MEDIAN_SEGMENT),
    "orders_above_customer_avg": (q_orders_above_customer_avg, ORACLE_ABOVE_AVG),
}

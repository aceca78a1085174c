"""Deterministic count-min sketch — portable frequency estimation
(beyond-reference; BASELINE.json north star names "a novel sketch" as a
custom-operator class).

A count-min sketch answers "how often does item x occur?" in
sub-linear space: ``depth`` hash rows x ``width`` buckets of counters;
each occurrence increments one bucket per row; the estimate is the MIN
over rows — always >= the true count, over only by hash collisions
(within eps = e/width of the stream size with probability
1 - (1/e)^depth; Cormode & Muthukrishnan 2005).

Two properties make this variant cluster- and oracle-grade:

- the hash family is md5-derived (first 8 hex chars of
  ``md5('<row>|<item>')`` mod width) — deterministic, partition-
  invariant, and reproducible in any engine with md5, so a sketch
  built on Spark can be probed in DuckDB (the contract oracle does
  exactly that).  Spark's HLL sketch has neither property.
- the sketch is a plain (row, bucket, cnt) DataFrame: build is one
  map-side-combinable groupBy whose output is depth x width rows
  REGARDLESS of stream size; sketches from delta partitions merge by
  adding counts (merge.merge_aggregates composes) — the incremental /
  distributed-combine story sketches exist for.

At 100 TB: the build shuffles depth rows per input row but each
carries only (int, int); the final state is KBs.  Probing is a
broadcast join of the sketch against the query items.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def _bucket(item: Column, row: int, width: int) -> Column:
    """md5-derived bucket of `item` for hash row `row` — first 8 hex
    chars as an int, mod width (same portable construction as the
    MinHash/LSH family in operators/dedup.py)."""
    h = F.md5(F.concat(F.lit(f"{row}|"), item.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def cms_build(
    df: DataFrame,
    item_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """(row, bucket, cnt) — count-min sketch of the item column.

    One narrow explode (xdepth) then one keyed groupBy; output is at
    most depth x width rows.  Sketches over disjoint inputs merge by
    summing cnt on (row, bucket)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        ensure_parallelism(df)
        .select(F.explode(rows).alias("rb"))
        .groupBy(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """(item, est) — count-min estimate per item: min over the sketch's
    depth rows of the item's bucket counter.  est >= true count always;
    an item absent from every bucket estimates 0 via the coalesce (an
    unseen item can still collide to a positive estimate — the CMS
    one-sided error).

    The sketch is broadcast (depth x width rows); probing is a narrow
    join per hash row folded into one min aggregation."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: int,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """(item, cnt) — every item occurring at least ``threshold`` times,
    with its EXACT count, found without a full keyed shuffle.

    The classic two-pass screen (Cormode & Muthukrishnan 2005 §4):

      1. build a count-min sketch (one map-side-combinable groupBy whose
         state is depth x width counters, collected driver-side — the
         same model-sized-collect license as kmeans centroids);
      2. re-scan and keep only rows whose CMS estimate reaches the
         threshold — a NARROW filter (depth md5s against literal counter
         arrays, whole-stage-codegen-able, no join);
      3. exact count + HAVING over the survivors only.

    The CMS never undercounts, so step 2 has **no false negatives** and
    step 3 makes the result exact — the sketch is semantically
    invisible (the contract oracle is a plain GROUP BY ... HAVING).
    At 100 TB with a skewed key domain the exact-count shuffle carries
    only the tiny possibly-heavy slice instead of every key — the same
    shuffle-avoidance trade as ``bloomjoin.bloom_semi_join`` (two cheap
    scans beat one full-width shuffle).  NULL items hash to NULL buckets
    and are dropped by the filter; callers wanting NULL-key counts must
    count them separately.
    """
    counters = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(df, item_col, width, depth).collect()
    }
    row_arrays = [
        F.array(
            *[F.lit(int(counters.get((r, b), 0))) for b in range(width)]
        )
        for r in range(depth)
    ]
    est = F.least(
        *[
            F.element_at(
                row_arrays[r], _bucket(F.col(item_col), r, width) + F.lit(1)
            )
            for r in range(depth)
        ]
    )
    return (
        df.where(est >= F.lit(threshold))
        .groupBy(item_col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
    )


def hll_registers(
    df: DataFrame,
    item_col: str,
    buckets: int = 64,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(bucket, register) — deterministic HyperLogLog register table
    over the item column (Flajolet et al. 2007), the distinct-count
    companion to ``cms_build``'s frequency sketch.

    Register construction (one md5 per DISTINCT item value, split like
    the MinHash family in operators/dedup.py):

      bucket   = first 8 md5 hex chars as int,  mod ``buckets``
      rho      = position of the highest set bit of the NEXT 8 hex
                 chars (1-based from bit 31; 33 for the all-zero word)
      register = MAX(rho) per bucket

    Same portability contract as the CMS: md5 + integer bit math exist
    in any engine (rho is ``33 - length(bin(w))`` — no clz needed), so
    the oracle rebuilds the registers EXACTLY in SQL; and registers are
    algebraic — sketches of disjoint inputs merge by MAX on bucket
    (``merge.merge_aggregates(max_cols=["register"])``), which is what
    makes the sketch maintainable over a stream.

    Build is one combinable groupBy -> at most ``buckets`` rows
    regardless of input size.  The cardinality ESTIMATE (harmonic mean
    + bias correction) is ``hll_estimate`` — floats, so it stays out of
    the register contract.

    ``key_cols`` builds one register table PER KEY (output bounded by
    |keys| x buckets) — the per-domain / per-day distinct-user sketch
    table a metrics store maintains incrementally: group twins merge
    by MAX on (keys, bucket), so daily deltas fold into the running
    table without rescanning history.
    """
    h = F.md5(F.concat(F.lit("hll|"), F.col("__item").cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(buckets)
    )
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # bin(w) has no leading zeros, so its length locates the top bit:
    # rho = 33 - length(bin(w)); the w == 0 corner (impossible-ish but
    # defined) maps to 33
    rho = F.when(F.col("__w") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.expr("bin(__w)"))
    )
    return (
        ensure_parallelism(df)
        .select(*key_cols, F.col(item_col).alias("__item"))
        .where(F.col("__item").isNotNull())
        .select(*key_cols, bucket.alias("bucket"), w.alias("__w"))
        .withColumn("register", rho.cast("int"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_estimate(registers: list[tuple[int, int]], buckets: int = 64) -> float:
    """Driver-side cardinality estimate from a collected register table
    (model-sized input: <= ``buckets`` rows).  Standard HLL estimator
    with the small-range (linear counting) correction; absent buckets
    count as register 0."""
    import math

    regs = {b: r for b, r in registers}
    m = buckets
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / s
    zeros = sum(1 for b in range(m) if regs.get(b, 0) == 0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def cms_join_size_estimate(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """1-row (est_join_rows) — upper bound on |A ⋈ B| on an equi-key,
    from two count-min sketches alone: per hash row, Σ_bucket
    cntA·cntB counts every true joining pair (both sides of a key land
    in the same bucket) plus collision cross-terms; the MIN over the
    depth rows is the tightest such bound.  Always >= the true join
    cardinality — the one-sided guarantee that makes it safe for join
    planning (size the shuffle / pick broadcast side / refuse a
    runaway join) WITHOUT running the join: the whole estimate reads
    two depth x width count tables.

    At 100 TB this is the optimizer's trick made explicit: sketches
    are built once per table (combinable, KB state, maintainable over
    a stream via merge_aggregates) and any pairwise join size quotes
    from them in O(depth x width).
    """
    a = cms_build(df_a, col_a, width, depth).select(
        "row", "bucket", F.col("cnt").alias("cnt_a")
    )
    b = cms_build(df_b, col_b, width, depth).select(
        "row", "bucket", F.col("cnt").alias("cnt_b")
    )
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("s"))
    )
    return per_row.agg(F.min("s").cast("long").alias("est_join_rows"))

"""Column profiling (data-quality observability) — reference parity
surface: the reference's safety validation counts rows and null keys
per table (etl_pipeline_spark.py:1390-1470); this generalizes it to a
per-column completeness/cardinality profile any table can report.

One aggregation pass computes every column's null count and exact
distinct count (Catalyst plans multiple COUNT DISTINCTs as one Expand —
a single scan), then a ``stack`` pivots the 1-row wide result into the
long (column, metrics) form.  The output is |columns| rows — constant-
size observability regardless of table size, which is what a 100 TB
profile has to be.

Exact COUNT DISTINCT is the right default for profiling dimension-ish
tables; for monstrous high-cardinality columns swap
``approx_count_distinct`` (rows-only semantics — the HLL estimate is
not engine-portable, same caveat as approx_distinct_users_daily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct) — one row per profiled
    column, computed in a single aggregation pass."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
    ).select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        "n_distinct",
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """(bucket, n) — fixed-width histogram via ``width_bucket`` (SQL
    standard: bucket 0 = underflow, nbins+1 = overflow, both kept so
    the histogram always accounts for every row).

    One map-side-combinable groupBy on an nbins-cardinality key — the
    constant-size profile shape.  The bucket expression is written out
    explicitly (``floor((x-lo)*n / (hi-lo)) + 1``) rather than via the
    engine's ``width_bucket`` builtin: engines disagree on the internal
    float association (and DuckDB lacks the function entirely), while
    the explicit form is the same IEEE operation sequence everywhere.
    """
    x = F.col(col).cast("double")
    flo, fhi = F.lit(float(lo)), F.lit(float(hi))
    bucket = (
        F.when(x < flo, F.lit(0))
        .when(x >= fhi, F.lit(nbins + 1))
        .otherwise(
            F.floor((x - flo) * F.lit(float(nbins)) / (fhi - flo)) + 1
        )
        .cast("long")
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def exact_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """(keys..., n, p<q>...) — EXACT nearest-rank quantiles per group,
    all in one windowed pass (generalizes the single-median query to a
    full profile row; interpolation-free so the picked values are real
    data points and cross-engine float identity holds).

    Quantile q is the value at 1-based rank ``ceil(q * n)`` in the
    group's value order (the "lower nearest-rank" definition — exact,
    no averaging).  approx_percentile is cheaper at scale but its
    sketch is neither deterministic across partitionings nor
    reproducible in another engine; this is the auditable form.

    Plan: one key shuffle + per-group sort (the window), then the
    quantile picks fold into ONE conditional aggregation — no second
    pass, no per-quantile scan.  Same hot-group caveat as
    sample.quota_sample: a single group's sort is one task.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(value_col).asc())
    ranked = df.select(
        *key_cols,
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(*key_cols)).alias("__n"),
    )
    picks = [
        F.max(
            F.when(
                F.col("__rn") == F.ceil(F.lit(q) * F.col("__n")),
                F.col(value_col),
            )
        ).alias(f"p{int(round(q * 100))}")
        for q in qs
    ]
    return ranked.groupBy(*key_cols).agg(
        F.max("__n").cast("long").alias("n"), *picks
    )


def exact_quantiles_ranged(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    num_partitions: int | None = None,
) -> DataFrame:
    """GLOBAL twin of ``exact_quantiles(df, [], value_col, qs)`` —
    identical nearest-rank picks (1-based rank ``ceil(q * n)``; the
    driver-side ``math.ceil(q * n)`` is the same IEEE double product
    the SQL form computes, so picks stay bit-identical) but computed
    DISTRIBUTED: range partition on the value, local row_number plus
    broadcast per-partition offsets gives every row its global rank
    (keys.surrogate_key_ranged's numbering; driver state
    O(#partitions)), then the <= |qs| rows AT the target ranks fold
    into the one-row profile.  No single-task sort of the world; tie
    runs may split across partitions, but the VALUE at any rank inside
    a tie run is the tied value itself, so picks are
    partition-invariant.  NULL values are excluded here (the keyed
    form leaves NULL handling to its callers, which pre-filter).

    Returns one row: (n, p<q>...) — empty input yields n=0 with NULL
    picks.
    """
    import math

    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.where(F.col(value_col).isNotNull())
        .select(value_col)
        .repartitionByRange(n_part, F.col(value_col).asc())
        .sortWithinPartitions(F.col(value_col).asc())
        .withColumn("__pid", F.spark_partition_id())
    ).localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for p in range(n_part):
        offsets.append((p, acc))
        acc += counts.get(p, 0)
    total = acc
    offsets_df = df.sparkSession.createDataFrame(
        offsets, schema="__pid int, __off long"
    )
    targets = {
        f"p{int(round(q * 100))}": (max(1, math.ceil(q * total)) if total else -1)
        for q in qs
    }
    local = Window.partitionBy("__pid").orderBy(F.col(value_col).asc())
    ranked = ranged.join(F.broadcast(offsets_df), "__pid").withColumn(
        "__rn", F.col("__off") + F.row_number().over(local)
    )
    picks_src = ranked.where(
        F.col("__rn").isin(*sorted(set(targets.values())))
    )
    picks = [
        F.max(
            F.when(F.col("__rn") == F.lit(rank), F.col(value_col))
        ).alias(name)
        for name, rank in targets.items()
    ]
    return picks_src.agg(F.lit(total).cast("long").alias("n"), *picks)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
    reliable: bool = False,
) -> DataFrame:
    """(key..., n, share, rank) — the `top` heaviest keys and their share
    of the table: the diagnosis step before operators/skew.py's salting
    (a join key whose top share is percents of the table is the one
    that stalls a 1000-executor shuffle on one task).

    One keyed groupBy (combinable) then a top-k cut over the |distinct
    keys| counts; share is ONE double division of exact counts.

    The top-k rank is DISTRIBUTED: ``global_rank`` over the counts frame
    (ascending by -n, struct-of-keys tie-break) — never an unpartitioned
    ``row_number`` window, which on this operator's own target workload
    (a skewed key over a 100 TB fact, distinct keys in the billions)
    would funnel every distinct key through one task to cut 10 rows.

    The counts frame is eager-pinned (localCheckpoint) because THREE
    consumers read it — global_rank's frequency/offset pass (which runs
    at build time to collect its O(#partitions) offsets), the ranked
    main pass, and the 1-row total aggregate.  Unpinned, each would
    re-scan the input: the pin guarantees the (possibly 100 TB) input
    is scanned exactly once, at build, and everything downstream reads
    the |distinct keys|-sized pin (test_skew_report_is_lazy_single_plan
    asserts the exactly-once property with an accumulator).  The total
    sums the per-key counts, not the top-k cut.

    Recovery caveat: ``localCheckpoint`` is NOT fault-tolerant — it
    truncates lineage, so losing an executor after the pin fails the
    job unrecoverably.  For long-running production diagnoses (hours
    over a 100 TB fact, where an executor loss is expected, and where
    the pin itself can be data-sized at billions of distinct keys) pass
    ``reliable=True``: the counts frame is instead persisted at
    ``MEMORY_AND_DISK_2`` (2x-replicated, spillable) with lineage kept,
    so a lost replica recomputes from the input rather than killing the
    job — the exactly-once scan becomes at-least-once only in the
    failure path."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    if reliable:
        from pyspark import StorageLevel

        counts = counts.persist(StorageLevel.MEMORY_AND_DISK_2)
        counts.count()  # materialize now: one input scan, replicated pin
    else:
        counts = counts.localCheckpoint(eager=True)
    total = counts.agg(F.sum("n").cast("double").alias("__total"))
    ranked = global_rank(
        counts.withColumn("__negn", -F.col("n")).withColumn(
            "__id", F.struct(*[F.col(c) for c in key_cols])
        ),
        "__negn",
        "__id",
    )
    return (
        ranked.filter(F.col("rank") <= top)
        .crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n",
            (F.col("n").cast("double") / F.col("__total")).alias("share"),
            "rank",
        )
    )


def global_rank(
    df: DataFrame, value_col: str, id_col: str
) -> DataFrame:
    """Input + ``rank`` (1-based, dense total order by (value, id)) —
    WITHOUT a single-partition window over the data.

    The naive ``row_number() OVER (ORDER BY v)`` collapses the whole
    table into one task.  The distributed construction:

      1. per-value frequencies — one combinable shuffle on the value;
      2. cumulative offsets over the frequency rows via the DISTRIBUTED
         exclusive prefix sum (``keys.prefix_sum_ranged``: range
         partition on the value, local running sum, broadcast
         O(#partitions) offsets) — no single-task pass even when the
         value column is near-unique;
      3. rank = value's offset + row_number within the value group
         ordered by id — a window PARTITIONED by value, distributed.

    Ranks are exact and deterministic (ties broken by id).  Caller
    contract: ``value_col`` non-NULL (engines disagree on NULL sort
    position — Spark ASC puts NULLs first, DuckDB last — so a NULL
    would make ranks engine-dependent; filter first).
    """
    from netflix_data_ingestion_spark.operators.keys import (
        prefix_sum_ranged,
    )

    freq = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__f")
    )
    cum = prefix_sum_ranged(freq, ["__v"], "__f", "__offset").select(
        "__v", "__offset"
    )
    within = F.row_number().over(
        Window.partitionBy(value_col).orderBy(F.col(id_col).asc())
    )
    return (
        df.withColumn("__within", within)
        .join(cum, F.col(value_col) == F.col("__v"))
        .withColumn(
            "rank", (F.col("__offset") + F.col("__within")).cast("bigint")
        )
        .drop("__v", "__offset", "__within")
    )


def equidepth_histogram(
    df: DataFrame, value_col: str, id_col: str, buckets: int = 10
) -> DataFrame:
    """(bucket, n_rows, min_v, max_v) — equi-DEPTH histogram with exact
    NTILE semantics (first n%B buckets get one extra row), built on
    ``global_rank`` so no single task ever sees the whole table.

    The fixed-width twin is ``histogram``; equi-depth is the form that
    survives skew (every bucket has ~n/B rows no matter the value
    distribution) and the boundary set IS the equi-height histogram
    statistics a cost-based optimizer keeps.
    """
    ranked = global_rank(df, value_col, id_col)
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # NTILE(B): with size = n div B and rem = n % B, rank r lands in
    # bucket ceil(r/(size+1)) while inside the first rem*(size+1) rows,
    # else rem + ceil((r - rem*(size+1))/size).  ceil(a/b) is spelled
    # (a+b-1) div b — SQL integer division end to end (a double ceil
    # would wobble near 2^53 row counts).
    bucket = F.expr(
        f"""CASE WHEN rank <= (__n % {buckets}) * ((__n div {buckets}) + 1)
             THEN (rank + (__n div {buckets})) div ((__n div {buckets}) + 1)
             ELSE (__n % {buckets})
                  + (rank - (__n % {buckets}) * ((__n div {buckets}) + 1)
                     + (__n div {buckets}) - 1) div (__n div {buckets})
        END"""
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket.cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def feature_correlations(
    df: DataFrame,
    cols: list[str],
    scale: int = 100,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(col_a, col_b, n, corr) — the pairwise Pearson correlation
    matrix of the numeric feature columns, in ONE aggregation pass,
    with EXACT integer moments (the feature-redundancy screen before
    training; `F.corr` is float-summation-order-dependent and neither
    partition-invariant nor oracle-checkable).  ``key_cols`` computes
    the matrix PER GROUP (feature-drift-by-segment) on the same single
    pass; output is |groups| x |pairs| rows.

    Discipline (the outliers.moments_build pattern): values quantize to
    1/``scale`` fixed-point longs; per pair, count / sums / sums of
    squares / cross products accumulate in DECIMAL(38,0) — exact, and
    identical on any partitioning.  The only floats are the final
    ``(n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))``
    with the two variance terms cast to double BEFORE their product
    (the exact decimals can exceed 38 digits multiplied), rounded to
    6 — one fixed op sequence both engines replay.  Pairwise-complete
    semantics: a row enters a pair's moments only when BOTH values are
    non-NULL.  Zero-variance pairs yield non-finite corr (IEEE /0) —
    screen first with profile_columns if that matters.
    """
    dec = "decimal(38,0)"
    names = list(cols)
    base = df.select(
        *key_cols,
        *[
            F.round(F.col(c) * F.lit(scale)).cast("long").alias(f"__v{i}")
            for i, c in enumerate(names)
        ],
    )
    pairs = [
        (i, j) for i in range(len(names)) for j in range(i + 1, len(names))
    ]
    aggs = []
    for i, j in pairs:
        vi = F.col(f"__v{i}").cast("decimal(18,0)")
        vj = F.col(f"__v{j}").cast("decimal(18,0)")
        both = F.col(f"__v{i}").isNotNull() & F.col(f"__v{j}").isNotNull()
        tag = f"{i}_{j}"
        aggs += [
            F.count(F.when(both, F.lit(1))).cast(dec).alias(f"n_{tag}"),
            F.sum(F.when(both, vi)).cast(dec).alias(f"sa_{tag}"),
            F.sum(F.when(both, vj)).cast(dec).alias(f"sb_{tag}"),
            F.sum(F.when(both, vi * vi)).cast(dec).alias(f"qa_{tag}"),
            F.sum(F.when(both, vj * vj)).cast(dec).alias(f"qb_{tag}"),
            F.sum(F.when(both, vi * vj)).cast(dec).alias(f"p_{tag}"),
        ]
    m = base.groupBy(*key_cols).agg(*aggs) if key_cols else base.agg(*aggs)
    out_structs = []
    for i, j in pairs:
        tag = f"{i}_{j}"
        n = F.col(f"n_{tag}")
        sa, sb = F.col(f"sa_{tag}"), F.col(f"sb_{tag}")
        qa, qb = F.col(f"qa_{tag}"), F.col(f"qb_{tag}")
        p = F.col(f"p_{tag}")
        num = (n * p - sa * sb).cast("double")
        da = (n * qa - sa * sa).cast("double")
        db = (n * qb - sb * sb).cast("double")
        out_structs.append(
            F.struct(
                F.lit(names[i]).alias("col_a"),
                F.lit(names[j]).alias("col_b"),
                n.cast("long").alias("n"),
                F.round(num / F.sqrt(da * db), 6).alias("corr"),
            )
        )
    return m.select(
        *key_cols, F.explode(F.array(*out_structs)).alias("r")
    ).select(*key_cols, "r.*")


def ols_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 100,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """1 row (n, slope, intercept) — closed-form simple linear
    regression y = slope·x + intercept, least squares, from the same
    exact DECIMAL(38,0) moment table as `feature_correlations`:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Trend lines, drift estimates, and detrending at 100 TB in ONE
    combinable aggregation pass — no iterative solver, no MLlib vector
    assembly, partition-invariant by integer exactness.  ``key_cols``
    fits one line PER GROUP (per-entity drift) on the same single
    pass; output is |groups| rows.  The two
    divisions are the only floats (slope first, then intercept REUSES
    the rounded slope so both engines replay the same sequence);
    intercept/slope come back in the ORIGINAL units (the fixed-point
    scale cancels in slope and divides out of the intercept).
    Complete-case semantics: rows where either side is NULL stay out.
    """
    dec = "decimal(38,0)"
    vx = F.round(F.col(x_col) * F.lit(scale)).cast("long")
    vy = F.round(F.col(y_col) * F.lit(scale)).cast("long")
    both = vx.isNotNull() & vy.isNotNull()
    dx = F.when(both, vx.cast("decimal(18,0)"))
    dy = F.when(both, vy.cast("decimal(18,0)"))
    aggs = [
        F.count(F.when(both, F.lit(1))).cast(dec).alias("__n"),
        F.sum(dx).cast(dec).alias("__sx"),
        F.sum(dy).cast(dec).alias("__sy"),
        F.sum(dx * dx).cast(dec).alias("__qx"),
        F.sum(dx * dy).cast(dec).alias("__p"),
    ]
    m = df.groupBy(*key_cols).agg(*aggs) if key_cols else df.agg(*aggs)
    n = F.col("__n")
    slope = F.round(
        (n * F.col("__p") - F.col("__sx") * F.col("__sy")).cast("double")
        / (n * F.col("__qx") - F.col("__sx") * F.col("__sx")).cast(
            "double"
        ),
        6,
    )
    return m.select(
        *key_cols,
        n.cast("long").alias("n"),
        slope.alias("slope"),
        F.round(
            (
                F.col("__sy").cast("double")
                - slope * F.col("__sx").cast("double")
            )
            / n.cast("double")
            / scale,
            6,
        ).alias("intercept"),
    )

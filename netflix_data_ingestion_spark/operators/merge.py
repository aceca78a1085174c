"""Row-level upsert (MERGE) between immutable snapshots — warehouse
parity surface.

The reference applies changes with batched UPDATE statements against a
mutable store (etl_pipeline_spark.py:1230-1252); a lakehouse on
immutable parquet expresses the same thing as snapshot algebra:

    merged = updates OVERRIDE target ON key   (latest wins)

i.e. Delta/Iceberg ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT``, as one full-outer join + per-column ``coalesce`` — no table
format required, and the result is a plain DataFrame the caller writes
with the usual partitioned/bucketed writers.

Plan shape: ONE shuffle per side on the key, sort-merge full-outer
(a full-outer join preserves BOTH sides, so Spark cannot broadcast it
— don't expect AQE to; with bucketed tables,
sources/writers.write_bucketed, the shuffles disappear and only the
merge-sort remains).  At 100 TB the win over the reference's
row-at-a-time UPDATE loop is the usual columnar-batch vs
per-row-roundtrip gap; if the CDC batch is tiny and the full-outer
shuffle of the large target matters, flip the problem: inner-join the
batch for updates + anti-join for inserts (two broadcastable joins)
— equivalent result when no deletes are present.

Deletes: pass ``tombstone_col`` naming a boolean column in ``updates``;
rows flagged true are dropped from the merged snapshot (the CDC
delete convention) rather than upserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Merged snapshot: ``updates`` rows win on key collision, unmatched
    ``target`` rows persist, unmatched ``updates`` rows insert.

    Both inputs must share the target's schema (plus the optional
    tombstone column on the updates side).  Column order of the result
    follows ``target``.
    """
    cols = target.columns
    t = target.alias("t")
    # a non-null presence marker makes the override WHOLE-ROW (an update
    # that sets a column to NULL must win — per-column coalesce would
    # silently resurrect the target's old value)
    u = updates.withColumn("__upd", F.lit(True)).alias("u")
    joined = t.join(u, key_cols, "full_outer")
    if tombstone_col is not None:
        joined = joined.filter(
            ~F.coalesce(F.col(f"u.{tombstone_col}"), F.lit(False))
        )
    matched = F.col("__upd").isNotNull()
    out_cols = []
    for c in cols:
        if c in key_cols:
            # join keys are already coalesced by the USING-style join
            out_cols.append(F.col(c))
        else:
            out_cols.append(
                F.when(matched, F.col(f"u.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
    return joined.select(*out_cols)


def merge_aggregates(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Combine two PARTIAL aggregate snapshots sharing a schema into the
    aggregate of their union — incremental view maintenance: fold a
    delta partition's aggregates into yesterday's snapshot instead of
    recomputing the full history (the reference recomputes; its
    customer back-fill rescans the whole fact table,
    etl_pipeline_spark.py:1370-1455).

    Only ALGEBRAIC aggregates merge (sum/count add; min/max combine);
    non-decomposable ones (exact median, exact count-distinct) don't —
    keep those in full recomputes or sketch them.  Float sums are
    combination-order-sensitive: quantize to int64 partials first
    (functions/vectors.group_centroids discipline) if bit-stability
    across merge orders matters.

    One full-outer join on the keys — shuffle-free on bucketed
    snapshots; keys present in only one side pass through unchanged.
    """
    oa = a.alias("a")
    ob = b.alias("b")
    joined = oa.join(ob, key_cols, "full_outer")

    def both(c, combine):
        av, bv = F.col(f"a.{c}"), F.col(f"b.{c}")
        return (
            F.when(av.isNull(), bv)
            .when(bv.isNull(), av)
            .otherwise(combine(av, bv))
            .alias(c)
        )

    out = [F.col(c) for c in key_cols]
    out += [both(c, lambda x, y: x + y) for c in sum_cols]
    out += [both(c, F.least) for c in min_cols]
    out += [both(c, F.greatest) for c in max_cols]
    return joined.select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """(keys..., change_type, values...) — the change feed that would
    transform snapshot ``old`` into snapshot ``new``: the INVERSE of
    `merge_upsert` (generate changes rather than apply them; feeding the
    output back through merge_upsert with a tombstone on 'delete'
    reproduces ``new``).

    change_type: 'insert' (key only in ``new``), 'delete' (key only in
    ``old``), 'update' (key in both, any value column differing
    NULL-SAFELY — NULL->value and value->NULL transitions are real
    updates, same discipline as scd2_history).  Unchanged rows are
    omitted.  Values are the NEW side's (NULL for deletes).

    Both inputs must be key-unique (snapshot semantics).  Plan shape:
    one full-outer sort-merge join on the key — identical posture to
    merge_upsert, bucketed tables make it shuffle-free.  At 100 TB this
    is how a lakehouse without a transactional format emits a CDC feed:
    diff the nightly snapshots, ship only the delta.
    """
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
    ).alias("o")
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
    ).alias("n")
    joined = o.join(n, key_cols, "full_outer")
    unchanged = F.lit(True)
    for c in value_cols:
        unchanged = unchanged & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~unchanged, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            *[F.col(f"__n_{c}").alias(c) for c in value_cols],
        )
    )


def incremental_join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """The JOIN DELTA under append-only updates: exactly the rows that
    (A∪ΔA) ⋈ (B∪ΔB) has beyond A ⋈ B — incremental view maintenance
    for joins (the classic delta rule; Blakeley et al., SIGMOD'86),
    the join-side companion to ``merge_aggregates``'s algebraic
    combine.

    Algebra: new⋈ − old⋈ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, computed here as
    ``ΔA ⋈ (B∪ΔB)  ∪  A ⋈ ΔB`` — two joins covering the three terms
    exactly once.  Both join only ON THE DELTAS' keys: at 100 TB the
    daily increment of a maintained join costs O(|Δ| + base rows
    matching Δ's keys) — with the base stored bucketed on ``on``
    (sources/writers.write_bucketed), the base side is a shuffle-free
    partition-pruned probe — instead of re-joining two full tables.

    Caller contract: deltas are strictly NEW rows (append-only; updates
    and deletes route through ``merge_upsert``/``snapshot_diff``
    first), and delta schemas match their bases.  Emitting the delta
    (not the merged view) is deliberate: downstream incremental
    consumers (merge_aggregates, sinks) want the increment.
    """
    b_full = base_b.unionByName(delta_b)
    return delta_a.join(b_full, on).unionByName(base_a.join(delta_b, on))

"""Right-to-be-forgotten cascade: delete every row tied to a key set
across a table graph, with exact audit accounting.

The GDPR/CCPA erasure shape for a lake: the forget-set (user ids from
deletion requests) is TINY next to the tables it touches, so every
delete is a broadcast anti-join — no shuffle of the 100 TB fact — and
children with no direct user key (lineitem) cascade through the keys
REMOVED from their parent (orders).  Same drop-accounting discipline as
the reference's safety checks (etl_pipeline_spark.py:433-567): every
deletion is counted, and rows_before == rows_removed + rows_after by
construction, not by trust.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def forget_keys(
    df: DataFrame,
    fk_col: str,
    keys: DataFrame,
    key_col: str,
    emit_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(kept_rows, removed_keys) — drop every row whose ``fk_col`` is in
    the forget-set; ``removed_keys`` is the distinct ``emit_col``
    (default ``fk_col``) of the rows actually deleted.  To cascade, emit
    the parent's PRIMARY key (e.g. delete orders by ``o_custkey``, emit
    ``o_orderkey``) and feed the result to the child's ``forget_keys``.
    Both joins broadcast the small side: the forget-set for the delete,
    the removed-key set for the cascade — the fact table is never
    shuffled.  NULL foreign keys never match a forget-set entry (SQL
    join semantics) and are kept.
    """
    fset = F.broadcast(keys.select(F.col(key_col).alias("__fk")).distinct())
    kept = df.join(fset, df[fk_col] == F.col("__fk"), "left_anti")
    removed_keys = (
        df.join(fset, df[fk_col] == F.col("__fk"), "left_semi")
        .select(F.col(emit_col or fk_col))
        .distinct()
    )
    return kept, removed_keys


def forget_audit(
    tables: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """(table_name, rows_before, rows_removed, rows_after) — one audit
    row per (name, df, fk_col, keys, key_col) entry, exact counts in a
    single pass per table: a broadcast membership join marks doomed
    rows, one aggregate counts both sides, and rows_after is derived —
    the three columns cannot disagree.  The frame is lazy (no eager
    ``count()``): one action computes the whole report.
    """
    audits = []
    for name, df, fk_col, keys, key_col in tables:
        marked = df.join(
            F.broadcast(
                keys.select(F.col(key_col).alias("__fk"))
                .distinct()
                .withColumn("__hit", F.lit(1))
            ),
            df[fk_col] == F.col("__fk"),
            "left",
        )
        audits.append(
            marked.agg(
                F.count("*").cast("long").alias("rows_before"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                .cast("long")
                .alias("rows_removed"),
            ).select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_removed",
                (F.col("rows_before") - F.col("rows_removed")).alias(
                    "rows_after"
                ),
            )
        )
    out = audits[0]
    for a in audits[1:]:
        out = out.unionAll(a)
    return out

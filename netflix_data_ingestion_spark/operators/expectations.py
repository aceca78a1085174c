"""Declarative data-quality expectation suite.

Reference parity surface, generalized: the reference pipeline hand-rolls
its safety checks — row counts, null keys, referential spot checks
(reference ``etl_pipeline_spark.py:1390-1470`` and the CHECK constraints
in ``schema.sql``) — as imperative code per table.  This operator makes
the checks DATA: a list of expectation specs compiled into one Spark
plan that emits a (check, column, n_rows, n_violations, passed) report
row per expectation (the shape Great Expectations / dbt tests
popularized).

Plan shape (100 TB):
  * every ROW-LEVEL expectation (not_null / in_range / in_set / regex)
    folds into ONE aggregation pass over the table — adding a check
    adds a conditional-sum column, not a scan;
  * ``unique`` adds one count-distinct to the same pass (Catalyst plans
    the distincts via a single Expand of the same scan);
  * ``foreign_key`` is a left-anti join against the dimension's key set
    (broadcast when the dimension is small — the usual case);
  * the report is a UNION of 1-row frames — constant-size output.

NULL semantics: range/set/regex checks count NULL as a violation only
if the expectation says so (``count_nulls``); by default NULLs are the
``not_null`` check's job — predicates are coalesced so a NULL never
silently passes NOR double-counts (the reference's NULL-predicate
accounting hazard, SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spec: (kind, column, params)
Spec = tuple


def expect_not_null(col: str) -> Spec:
    return ("not_null", col, {})


def expect_unique(col: str) -> Spec:
    return ("unique", col, {})


def expect_in_range(
    col: str, lo: float | int, hi: float | int, count_nulls: bool = False
) -> Spec:
    return ("in_range", col, {"lo": lo, "hi": hi, "count_nulls": count_nulls})


def expect_in_set(
    col: str, values: Sequence, count_nulls: bool = False
) -> Spec:
    return ("in_set", col, {"values": tuple(values), "count_nulls": count_nulls})


def expect_regex(col: str, pattern: str, count_nulls: bool = False) -> Spec:
    return ("regex", col, {"pattern": pattern, "count_nulls": count_nulls})


def expect_foreign_key(col: str, dim: DataFrame, dim_col: str) -> Spec:
    return ("foreign_key", col, {"dim": dim, "dim_col": dim_col})


def _violation(kind: str, c: Column, p: dict) -> Column:
    """Row-level violation predicate, NULL-safe: NULL values violate only
    when count_nulls is set (otherwise they are not this check's job)."""
    if kind == "in_range":
        bad = (c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))
    elif kind == "in_set":
        bad = ~c.isin(*p["values"])
    elif kind == "regex":
        bad = ~c.rlike(p["pattern"])
    else:  # not_null
        return c.isNull()
    if p.get("count_nulls"):
        return F.coalesce(bad, F.lit(True))
    return F.coalesce(bad, F.lit(False))


def run_expectations(df: DataFrame, specs: Sequence[Spec]) -> DataFrame:
    """One report row per expectation: (check, column, n_rows,
    n_violations, passed), computed lazily as a single plan."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    order: list[tuple[str, str]] = []
    fk_frames: list[DataFrame] = []
    for i, (kind, col, p) in enumerate(specs):
        if kind == "foreign_key":
            keys = p["dim"].select(
                F.col(p["dim_col"]).alias("__fk")
            ).distinct()
            missing = (
                df.select(F.col(col).alias("__fk"))
                .where(F.col("__fk").isNotNull())
                .join(F.broadcast(keys), "__fk", "left_anti")
            )
            fk_frames.append(
                df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
                .crossJoin(
                    missing.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_violations")
                    )
                )
                .select(
                    F.lit(kind).alias("check"),
                    F.lit(col).alias("column"),
                    "n_rows",
                    "n_violations",
                    (F.col("n_violations") == 0).alias("passed"),
                )
            )
            continue
        if kind == "unique":
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col)))
                .cast("bigint")
                .alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(_violation(kind, F.col(col), p).cast("long"))
                .cast("bigint")
                .alias(f"__v{i}")
            )
        order.append((kind, col, f"__v{i}"))

    frames: list[DataFrame] = []
    if order:
        # ONE wide aggregate row pivoted to long form via stack — a
        # UNION of per-check selects would duplicate the aggregation
        # subtree (one scan per check); stack keeps it one scan total
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{kind}', '{col}', coalesce({v}, 0L)" for kind, col, v in order
        )
        frames.append(
            wide.selectExpr(
                "__n",
                f"stack({len(order)}, {stack_args})"
                " AS (check, column, n_violations)",
            ).select(
                "check",
                "column",
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col("n_violations").cast("bigint").alias("n_violations"),
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    frames.extend(fk_frames)
    out = frames[0]
    for frame in frames[1:]:
        out = out.unionAll(frame)
    return out


def schema_diff(a: DataFrame, b: DataFrame) -> list[dict]:
    """Metadata-only contract check between two frames (yesterday's
    drop vs today's, producer vs consumer expectation): one dict per
    differing column — ``{column, in_a, in_b, type_a, type_b, change}``
    with change in {added, removed, retyped}.  Empty list = compatible.
    Driver-side schema walk; NO data is scanned, so it is free to run
    before every ingest (the formats layer's additive-evolution story
    made checkable)."""
    ta = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    tb = {f.name: f.dataType.simpleString() for f in b.schema.fields}
    out: list[dict] = []
    for name in sorted(set(ta) | set(tb)):
        if name not in tb:
            out.append({"column": name, "in_a": True, "in_b": False,
                        "type_a": ta[name], "type_b": None,
                        "change": "removed"})
        elif name not in ta:
            out.append({"column": name, "in_a": False, "in_b": True,
                        "type_a": None, "type_b": tb[name],
                        "change": "added"})
        elif ta[name] != tb[name]:
            out.append({"column": name, "in_a": True, "in_b": True,
                        "type_a": ta[name], "type_b": tb[name],
                        "change": "retyped"})
    return out

"""Z-order (Morton curve) layout keys for multi-column data clustering.

The 100 TB layout problem: parquet min/max pruning only helps on the
sort column.  Sorting by ``date`` makes ``customer`` predicates scan
everything and vice versa.  Interleaving the bits of BOTH columns'
normalized bucket indices into one Morton key and range-partitioning /
sorting by that key gives every interleaved column locality — each
output file covers a small rectangle of the (date, customer) space, so
min/max statistics prune scans on ANY of the interleaved columns (the
technique behind Delta/Iceberg Z-ORDER clustering; Morton 1966).

Everything here is integer arithmetic:

  bucket_i = (v_i - min_i) * 2^bits  DIV  (max_i - min_i + 1)
  zkey     = interleave(bucket_0, bucket_1, ...)

statically unrolled into ``bits x ncols`` shift/mask terms — whole-
stage-codegen-able JVM expressions, no UDF, bit-identical in any
engine (the DuckDB oracle runs the same unrolled SQL).  The min/max
normalization bounds come from a 1-row aggregate frame broadcast onto
the rows (one extra pass; lazy, same pattern as profile.skew_report).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(buckets: Sequence[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` of each bucket index: bit j of
    column i lands at output bit ``j * ncols + i``."""
    ncols = len(buckets)
    terms = []
    for i, b in enumerate(buckets):
        for j in range(bits):
            terms.append(
                (b.bitwiseAND(F.lit(1 << j).cast("long")) != 0).cast("long")
                * F.lit(1 << (j * ncols + i)).cast("long")
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> DataFrame:
    """Input + ``zkey``: the Morton interleave of each column's
    min/max-normalized 2^bits-bucket index.  Columns must be integral
    (cast currency to cents first); ``bits * len(cols)`` must be < 63.
    """
    if bits * len(cols) >= 63:
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__max_{c}"))
    bounds = df.agg(*aggs)
    withb = df.crossJoin(F.broadcast(bounds))
    buckets = [
        # (v - min) * 2^bits DIV (span + 1): exact integer bucket in
        # [0, 2^bits), max value included via the +1
        F.expr(
            f"((CAST({c} AS BIGINT) - __min_{c}) * {1 << bits}) "
            f"div (__max_{c} - __min_{c} + 1)"
        )
        for c in cols
    ]
    return withb.withColumn("zkey", _interleave(buckets, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition by the Morton key (each output partition = one
    compact rectangle of the column space) — the frame to hand to a
    partitioned parquet write so min/max stats prune on every
    interleaved column."""
    keyed = zorder_key(df, cols, bits)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, F.col("zkey"))


def duckdb_zkey_sql(
    cols: Sequence[str], bits: int = 16, table: str = "t"
) -> str:
    """The identical unrolled bucket+interleave arithmetic as ONE SQL
    expression (oracle parity; mins/maxes expected as __min_/__max_
    columns in scope)."""
    ncols = len(cols)
    terms = []
    for i, c in enumerate(cols):
        b = (
            f"(((CAST({c} AS BIGINT) - __min_{c}) * {1 << bits}) "
            f"// (__max_{c} - __min_{c} + 1))"
        )
        for j in range(bits):
            terms.append(
                f"(CASE WHEN ({b} & {1 << j}) != 0 "
                f"THEN {1 << (j * ncols + i)} ELSE 0 END)"
            )
    return "(" + " + ".join(terms) + ")"

"""Order-invariant table digest — cheap cross-system data parity.

"Did the migration/replication/backfill produce the same table?" at
100 TB cannot be answered by sorting and diffing.  The mergeable
answer: hash every row to an integer, SUM — addition is commutative,
so the digest is independent of row order, partitioning, and file
layout, and two engines (or two clusters) can each compute their side
locally and compare 16 bytes.  This file's oracle contract is itself
the proof the digest crosses engines.

Numeric discipline: each row contributes the first 12 hex digits of
its md5 (2^48), summed in DECIMAL(38,0) — overflow-free past 10^25
rows; the digest column is the decimal rendered as a string so no
engine's integer width is in play.

Caveat owned: a SUM digest is forgeable by adversarial row PAIRS
(values canceling), fine for drift/parity detection, not for
tamper-proofing.  And the caller canonicalizes columns first (casts
floats to fixed-point, timestamps to epoch ints) — engines do not
render doubles identically, so the contract is over STRINGS the caller
controls.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_digest(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """One row: (n_rows, digest) — order/partition/layout-invariant
    content digest over the given columns (default: all, in schema
    order).  NULL and the empty string hash differently (explicit
    NULL sentinel), and the column ORDER is part of the contract.
    Plan: one narrow projection + one combinable aggregate; no shuffle
    beyond the final 1-row combine.
    """
    use = list(cols) if cols is not None else list(df.columns)
    canon = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x01NULL"))
            for c in use
        ],
    )
    lane = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.select(lane.alias("__h")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("__h").cast("decimal(38,0)").cast("string").alias("digest"),
    )

"""Ordered funnel analysis — beyond-reference (BASELINE.json north star;
the reference's analytics stop at flat GROUP BY rollups,
schema.sql:131-237).

"Did the user view, THEN click, THEN purchase?" is an ordered-
subsequence match, not a set-membership test — a user who purchased
before ever viewing has funnel depth 1, not 3.  The classic product-
analytics primitive, computed here as a chain of conditional-min
aggregations:

    t_1 = MIN(ts) of stage-1 events
    t_i = MIN(ts) of stage-i events STRICTLY AFTER t_{i-1}

Each stage is one filter -> keyed groupBy -> join against the previous
stage's survivors; survivors shrink monotonically, so later stages
aggregate ever-smaller frames (the same ladder economics as
operators/curate).  All joins are key-equi on the funnel key and the
right side is at most one row per surviving key — broadcast-sized
relative to the event log.  No windows, no per-key event arrays: state
per key is ONE timestamp per stage, which is what lets the same query
run over a 100 TB event log without collecting sequences.

Strictly-after semantics uses ``>`` on the event timestamp, so
same-timestamp stage pairs do NOT advance the funnel (deterministic;
both engines agree because no float or ordering ambiguity exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """(key, reached_<stage>..., funnel_depth) — one row per key that
    appears in the event log, with a boolean per stage and the depth
    (number of stages completed in order).

    ``reached_s`` flags are monotone by construction: a key can only
    reach stage i after reaching stage i-1.
    """
    keys = df.select(F.col(key_col)).distinct()
    prev: DataFrame | None = None
    stage_frames: list[DataFrame] = []
    for i, stage in enumerate(stages):
        cand = df.filter(F.col(type_col) == stage).select(
            F.col(key_col), F.col(ts_col).alias("__ts")
        )
        if prev is not None:
            cand = cand.join(prev, key_col).filter(
                F.col("__ts") > F.col(f"__t{i - 1}")
            )
        cur = cand.groupBy(key_col).agg(F.min("__ts").alias(f"__t{i}"))
        stage_frames.append(cur)
        prev = cur
    out = keys
    for i, cur in enumerate(stage_frames):
        out = out.join(cur, key_col, "left")
    depth = sum(
        (F.col(f"__t{i}").isNotNull().cast("int") for i in range(len(stages))),
        F.lit(0),
    )
    sel = [F.col(key_col)]
    sel += [
        F.col(f"__t{i}").isNotNull().alias(f"reached_{s}")
        for i, s in enumerate(stages)
    ]
    sel.append(depth.cast("long").alias("funnel_depth"))
    return out.select(*sel)

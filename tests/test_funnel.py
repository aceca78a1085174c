"""Ordered funnel analysis (operators/funnel.py)."""

import datetime

from netflix_data_ingestion_spark.operators.funnel import funnel_depth


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_funnel_order_matters(spark):
    rows = [
        # u1: full ordered funnel
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE view/click — depth must be 2, not 3
        (2, _ts(0), "purchase"), (2, _ts(1), "view"), (2, _ts(2), "click"),
        # u3: only noise events — depth 0
        (3, _ts(0), "error"), (3, _ts(1), "signup"),
        # u4: view then purchase with no click between — depth 1
        (4, _ts(0), "view"), (4, _ts(1), "purchase"),
        # u5: same-timestamp view+click — strict > means click ignored
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in funnel_depth(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert len(out) == 5
    assert out[1]["funnel_depth"] == 3 and out[1]["reached_purchase"]
    assert out[2]["funnel_depth"] == 2 and not out[2]["reached_purchase"]
    assert out[3]["funnel_depth"] == 0 and not out[3]["reached_view"]
    assert out[4]["funnel_depth"] == 1
    assert out[5]["funnel_depth"] == 1 and not out[5]["reached_click"]

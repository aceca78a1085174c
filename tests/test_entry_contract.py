"""Driver-contract smoke: entry() + every query runs at sf0.001 and each
oracle key maps to a registered query (full value comparison lives in
tools/check_correctness.py, run at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_run_at_smoke_scale(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_rotation_lists_reference_real_queries():
    """Every name in the verification-rotation lists must be a registered
    query — a typo would silently starve a query of its driver row."""
    from netflix_data_ingestion_spark.plans.contract import (
        REGISTRY,
        _APPLIED_ROTATION,
        _VERIFY_FIRST,
        _VERIFY_ORDER,
        _VERIFY_ORDER6,
        _VERIFY_ROUND5,
        _VERIFY_ROUND6,
        _VERIFY_ROUND7,
        _VERIFY_ROUND8,
        _VERIFY_ROUND9,
        _VERIFY_ROUND10,
    )

    historical = {
        "_VERIFY_FIRST": _VERIFY_FIRST,
        "_VERIFY_ROUND5": _VERIFY_ROUND5,
        "_VERIFY_ORDER": _VERIFY_ORDER,
        "_VERIFY_ROUND6": _VERIFY_ROUND6,
        "_VERIFY_ORDER6": _VERIFY_ORDER6,
        "_VERIFY_ROUND7": _VERIFY_ROUND7,
        "_VERIFY_ROUND8": _VERIFY_ROUND8,
        "_VERIFY_ROUND9": _VERIFY_ROUND9,
        "_VERIFY_ROUND10": _VERIFY_ROUND10,
    }
    for label, names in historical.items():
        assert set(names) <= set(REGISTRY), label
        assert len(set(names)) == len(names), label
    # The rotated head IS the driver's sample window.  Assert against the
    # exported _APPLIED_ROTATION — the single name contract.py rebinds when
    # a round advances the window — so this test can never pin a stale
    # round-specific list (round-7 lesson: it pinned _VERIFY_ORDER6 and
    # went red when the r7 head was applied).
    assert list(REGISTRY)[: len(_APPLIED_ROTATION)] == _APPLIED_ROTATION

"""Driver-parity dtype gate for the DuckDB oracles.

The driver materializes oracle results through pandas and compares a
dtype-sensitive value hash against the Spark result.  DuckDB's HUGEINT
(the result type of SUM(BIGINT), windowed or grouped, and of integer
division on it) has no pandas integer representation, so ``fetchdf()``
silently materializes it as float64 while the Spark twin emits int64 —
values equal, hash mismatched.  That exact class produced the two red
rows of CORRECTNESS_r05 (``orders_price_drift``, ``part_abc_classes``)
and two latent copies (``nation_revenue_share``,
``session_entry_conversion``).

This gate runs ``DESCRIBE <oracle>`` (binding only — no execution) for
every registered oracle at sf0.001 and fails if any output column's
declared type contains HUGEINT, so the class cannot be reintroduced.
Oracles that need exact wide-integer arithmetic internally may still use
``::HUGEINT`` mid-query; only the SELECT output types are gated — a
final ``CAST(... AS BIGINT)`` (or DECIMAL(38,0) when the Spark twin
emits decimal) is the required convention.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

BANNED = ("HUGEINT",)  # covers UHUGEINT via substring match


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_oracle_output_columns(con):
    import __spark_entry__ as e

    offenders: dict[str, dict[str, str]] = {}
    errors: dict[str, str] = {}
    for name, sql in e.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex).splitlines()[0]
            continue
        hits = {
            row[0]: row[1]
            for row in desc
            if any(b in str(row[1]).upper() for b in BANNED)
        }
        if hits:
            offenders[name] = hits
    assert not errors, f"oracles failed to bind under DESCRIBE: {errors}"
    assert not offenders, (
        "oracle output columns materialize as pandas float64 and will "
        f"fail the driver's dtype-sensitive hash — CAST to BIGINT: {offenders}"
    )

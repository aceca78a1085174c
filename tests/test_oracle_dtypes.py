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


def test_duckdb_varchar_indexing_is_codepoint_parity():
    """Pin the string-indexing semantics the multimodal oracles depend
    on (ADVICE r9): the MP4/AVI/GIF oracles index document text with
    ``t[k]``/``unicode(t[k])`` while the Spark synth stages use Python
    codepoint indexing ``ord(t[k])``.  In DuckDB 1.0.0 both
    ``length()`` and ``t[k]`` are codepoint-based (verified here on a
    combining sequence AND a multi-codepoint ZWJ emoji grapheme), so
    the two sides agree on arbitrary unicode — but DuckDB has shipped
    grapheme-cluster semantics for other string functions, so a future
    upgrade could silently diverge the oracles on any document with
    combining marks.  This test fails loudly instead."""
    con = duckdb.connect()
    for s in ("aéb", "x\U0001F468‍\U0001F469‍\U0001F467y"):
        n = con.execute("SELECT length(?)", [s]).fetchone()[0]
        assert n == len(s), (s, n, len(s))
        cps = con.execute(
            "SELECT list_transform(range(1, length(?)+1), i -> unicode(?[i]))",
            [s, s],
        ).fetchone()[0]
        assert cps == [ord(c) for c in s], s
    con.close()

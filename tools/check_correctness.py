"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value
comparison (rows sorted, columns sorted by name).  Floats compare
exactly by default — the queries themselves round — with a tiny epsilon
fallback reported separately so near-misses are visible.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR_DEFAULT = "/root/testdata/sf0.01"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(
    rows: list[dict], cols: list[str], null_cols: set[str] = frozenset()
) -> list[tuple]:
    # DTYPE-SENSITIVE, like the driver's hash: each value carries a kind
    # tag so 319026 (Spark int64) != 319026.0 (pandas float64 from a
    # DuckDB HUGEINT column) even though the numbers are equal.  The
    # round-5 red rows (orders_price_drift, part_abc_classes) were
    # exactly this class and the old value-only compare passed them.
    #
    # Exception (driver parity): an integer column that CONTAINS a NULL
    # materializes as float64 through pandas on BOTH engines (Spark
    # toPandas and DuckDB fetchdf alike), so for columns in `null_cols`
    # ints are coerced to float before tagging — matching the driver,
    # which hashes both sides post-pandas.
    def keyify(col, v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            if col in null_cols:
                return ("f", float(v))
            return ("i", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            # bit-exact: the queries' numeric discipline (single int/int
            # divisions, round-of-exact-decimal sums) guarantees identical
            # doubles across engines — don't mask regressions by rounding
            return ("f", v)
        # unify date vs timestamp-at-midnight across engines (driver-green
        # date columns prove the driver's comparator does the same)
        if isinstance(v, _dt.datetime):
            return ("t", v)
        if isinstance(v, _dt.date):
            return ("t", _dt.datetime(v.year, v.month, v.day))
        return v

    out = [tuple(keyify(c, r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from netflix_data_ingestion_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR_DEFAULT
    only = set(sys.argv[2:])

    spark = build_session(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
            spark_cols = sorted(sdf.columns)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue

        if name not in oracles:
            print(
                f"ROWS  {name}: {len(spark_rows)} rows (rows-only check, "
                f"{time.time()-t0:.1f}s)"
            )
            continue

        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue

        duck_cols = sorted(ddf.columns)
        duck_rows = ddf.to_dict("records")
        # pandas NaN -> None for non-float comparisons
        for r in duck_rows:
            for k, v in r.items():
                if isinstance(v, float) and math.isnan(v):
                    r[k] = None
                elif v is not None and v != v:  # pandas NaT (NULL timestamp)
                    r[k] = None
                elif hasattr(v, "to_pydatetime"):
                    r[k] = v.to_pydatetime()
                elif hasattr(v, "item"):
                    r[k] = v.item()

        ok = True
        if spark_cols != duck_cols:
            print(f"FAIL  {name}: columns {spark_cols} != {duck_cols}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(
                f"FAIL  {name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
            )
            ok = False
        else:
            null_cols = {
                c
                for c in duck_cols
                if any(r[c] is None for r in spark_rows)
                or any(r[c] is None for r in duck_rows)
            }
            a = normalize(spark_rows, duck_cols, null_cols)
            b = normalize(duck_rows, duck_cols, null_cols)
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
                ok = False
        if ok:
            print(
                f"PASS  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)"
            )
        else:
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Reference query layer over a built star schema, checked against an
independent DuckDB oracle on the same Parquet tables."""

from __future__ import annotations

import pytest

from netflix_data_ingestion_spark.plans import analytics


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Build a small star schema via the pipeline and register DuckDB views."""
    import random

    from netflix_data_ingestion_spark.pipeline import StarPipeline

    root = tmp_path_factory.mktemp("analytics_wh")
    rng = random.Random(7)
    ratings_path = root / "combined_data_1.txt"
    with open(ratings_path, "w") as f:
        for mid in range(1, 16):
            f.write(f"{mid}:\n")
            for _ in range(rng.randint(5, 120)):
                f.write(
                    f"{rng.randint(1, 60)},{rng.randint(1, 5)},"
                    f"200{rng.randint(0, 5)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}\n"
                )
    movies_path = root / "movie_titles.csv"
    with open(movies_path, "w") as f:
        for mid in range(1, 16):
            f.write(f"{mid},{1990 + mid},Movie {mid}\n")

    pipe = StarPipeline(
        spark,
        str(root / "wh"),
        [str(ratings_path)],
        str(movies_path),
        date_range=("2000-01-01", "2005-12-31"),
    )
    pipe.run()
    return pipe


@pytest.fixture(scope="module")
def duck(warehouse):
    import duckdb

    con = duckdb.connect()
    for t in ["fact_ratings", "dim_date", "dim_movie", "dim_customer"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{warehouse._table_path(t)}/**/*.parquet'"
        )
    return con


def test_top_10_most_rated(warehouse, duck):
    got = [
        (r["movie_id"], r["rating_count"])
        for r in analytics.top_10_most_rated(
            warehouse.read("fact_ratings"), warehouse.read("dim_movie")
        ).collect()
    ]
    expected = [
        tuple(r)
        for r in duck.execute(
            """
            SELECT m.movie_id, COUNT(*) AS rating_count
            FROM fact_ratings f JOIN dim_movie m USING (movie_key)
            GROUP BY m.movie_id
            ORDER BY rating_count DESC, m.movie_id ASC LIMIT 10
            """
        ).fetchall()
    ]
    assert got == expected


def test_daily_summary_matches_oracle(warehouse, duck):
    got = {
        r["date_actual"]: (
            r["total_ratings"],
            r["unique_customers"],
            r["unique_movies"],
        )
        for r in analytics.v_daily_rating_summary(
            warehouse.read("fact_ratings"), warehouse.read("dim_date")
        ).collect()
    }
    expected = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            """
            SELECT d.date_actual, COUNT(*), COUNT(DISTINCT f.customer_key),
                   COUNT(DISTINCT f.movie_key)
            FROM fact_ratings f JOIN dim_date d USING (date_key)
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == expected


def test_trend_by_year(warehouse, duck):
    got = {
        r["year"]: r["total_ratings"]
        for r in analytics.rating_trend_by_year(
            warehouse.read("fact_ratings"), warehouse.read("dim_date")
        ).collect()
    }
    expected = {
        r[0]: r[1]
        for r in duck.execute(
            """
            SELECT d.year, COUNT(*) FROM fact_ratings f
            JOIN dim_date d USING (date_key) GROUP BY 1
            """
        ).fetchall()
    }
    assert got == expected


def test_most_active_and_span(warehouse, duck):
    rows = analytics.most_active_customers(
        warehouse.read("fact_ratings"), warehouse.read("dim_customer"), limit=5
    ).collect()
    expected = duck.execute(
        """
        SELECT c.customer_id, COUNT(*) AS total_ratings,
               date_diff('day', MIN(CAST(f.rating_timestamp AS DATE)),
                         MAX(CAST(f.rating_timestamp AS DATE))) AS active_days
        FROM fact_ratings f JOIN dim_customer c USING (customer_key)
        GROUP BY 1 ORDER BY total_ratings DESC, customer_id ASC LIMIT 5
        """
    ).fetchall()
    assert [
        (r["customer_id"], r["total_ratings"], r["active_days"]) for r in rows
    ] == [tuple(r) for r in expected]


def test_integrity_and_counts(warehouse):
    fact = warehouse.read("fact_ratings")
    assert (
        analytics.orphaned_ratings(fact, warehouse.read("dim_customer")).count()
        == 0
    )
    counts = {
        r["table_name"]: r["row_count"]
        for r in analytics.row_count_verification(
            {
                "fact_ratings": fact,
                "dim_movie": warehouse.read("dim_movie"),
                "dim_customer": warehouse.read("dim_customer"),
                "dim_date": warehouse.read("dim_date"),
            }
        ).collect()
    }
    assert counts["dim_movie"] == 15
    assert counts["dim_date"] == 2192  # 2000-01-01..2005-12-31
    assert counts["fact_ratings"] == fact.count()


def test_warehouse_summary(warehouse):
    row = analytics.warehouse_summary(
        warehouse.read("fact_ratings"), warehouse.read("dim_date")
    ).collect()[0]
    assert row["total_ratings"] > 0
    assert row["first_date"] <= row["last_date"]
    assert 1.0 <= row["avg_rating"] <= 5.0


def test_top_rated_having_filter(warehouse):
    rows = analytics.top_rated_min_ratings(
        warehouse.read("fact_ratings"),
        warehouse.read("dim_movie"),
        min_ratings=50,
    ).collect()
    assert all(r["rating_count"] >= 50 for r in rows)
    # ordered by avg desc
    avgs = [r["avg_rating"] for r in rows]
    assert avgs == sorted(avgs, reverse=True)

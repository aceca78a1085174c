"""Golden end-to-end star-schema build vs a single-threaded Python oracle
(SURVEY.md §5.2.2) + the orchestrator's idempotent stage semantics."""

from __future__ import annotations

import random

import pytest

from netflix_data_ingestion_spark.pipeline import StarPipeline


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("netflix_fixture")
    rng = random.Random(42)
    n_movies, n_customers = 25, 120

    expected = {}  # movie_id -> detail count
    customers = set()
    detail_count = 0
    paths = []
    for fi, movie_range in enumerate([range(1, 14), range(14, n_movies + 1)]):
        p = root / f"combined_data_{fi + 1}.txt"
        with open(p, "w") as f:
            for mid in movie_range:
                f.write(f"{mid}:\n")
                n = 0 if rng.random() < 0.15 else rng.randint(1, 60)
                expected[mid] = n
                for _ in range(n):
                    cid = rng.randint(1, n_customers) * 7  # sparse ids
                    customers.add(cid)
                    f.write(
                        f"{cid},{rng.randint(1, 5)},"
                        f"200{rng.randint(0, 5)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}\n"
                    )
                    detail_count += 1
        paths.append(str(p))

    movies_csv = root / "movie_titles.csv"
    with open(movies_csv, "w") as f:
        for mid in range(1, n_movies + 1):
            f.write(f"{mid},{1980 + mid},Title {mid}, Part {mid}\n")

    return {
        "paths": paths,
        "movies_csv": str(movies_csv),
        "expected_blocks": expected,
        "customers": customers,
        "detail_count": detail_count,
        "warehouse": str(root / "warehouse"),
    }


def test_full_build_golden(spark, fixture_files):
    pipe = StarPipeline(
        spark,
        fixture_files["warehouse"],
        fixture_files["paths"],
        fixture_files["movies_csv"],
        date_range=("2000-01-01", "2005-12-31"),
    )
    results = pipe.run()
    by_name = {r.name: r for r in results}

    assert by_name["dim_movie"].rows == 25
    assert by_name["dim_customer"].rows == len(fixture_files["customers"])
    assert by_name["fact_ratings"].rows == fixture_files["detail_count"]

    # per-movie fact counts == generated block sizes (FIXTURES.md A3 invariant)
    fact = pipe.read("fact_ratings")
    dim_movie = pipe.read("dim_movie")
    got = {
        r["movie_id"]: r["cnt"]
        for r in fact.join(dim_movie, "movie_key")
        .groupBy("movie_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    expected_nonzero = {
        m: n for m, n in fixture_files["expected_blocks"].items() if n > 0
    }
    assert got == expected_nonzero

    # zero orphans (schema.sql:188-191 anti-join integrity)
    dim_customer = pipe.read("dim_customer")
    assert fact.join(dim_customer, "customer_key", "left_anti").count() == 0

    # manifest validation: recount matches recorded counts
    assert all(pipe.validate().values())


def test_rerun_skips_completed_stages(spark, fixture_files):
    pipe = StarPipeline(
        spark,
        fixture_files["warehouse"],
        fixture_files["paths"],
        fixture_files["movies_csv"],
        date_range=("2000-01-01", "2005-12-31"),
    )
    results = pipe.run()
    assert all(r.skipped for r in results)


def test_no_lingering_persistent_rdds(spark, fixture_files, tmp_path):
    """The ffill/surrogate-key pins must not leak storage for the session
    lifetime: no CacheManager entries ever (nothing persist()s), and the
    GC-scoped localCheckpoint blocks drain once results are dropped."""
    import gc
    import time

    def drain_to(target: int, seconds: float = 30.0) -> int:
        """GC until the persistent-RDD count stops exceeding `target`
        (other test modules may hold live checkpointed frames in
        module-scoped fixtures — those are referenced, not leaked)."""
        deadline = time.time() + seconds
        size = spark.sparkContext._jsc.getPersistentRDDs().size()
        while size > target and time.time() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            size = spark.sparkContext._jsc.getPersistentRDDs().size()
        return size

    baseline = drain_to(0)  # whatever other live fixtures still pin
    pipe = StarPipeline(
        spark,
        str(tmp_path / "wh"),
        fixture_files["paths"],
        fixture_files["movies_csv"],
        date_range=("2000-01-01", "2005-12-31"),
    )
    pipe.run()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    del pipe
    assert drain_to(baseline) <= baseline

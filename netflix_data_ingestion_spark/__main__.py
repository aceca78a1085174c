"""CLI entry point — ``python -m netflix_data_ingestion_spark``.

Orchestrated ``main()`` with staged progress logging and exit codes
mirroring the reference pipeline runner
(``/root/reference/etl_pipeline_spark.py:1510-1646``):

* ``0``   — pipeline completed successfully
* ``1``   — pipeline failed (any exception; stage outputs already written
  stay on disk, and a re-run resumes from the manifest)
* ``2``   — pre-flight safety validation failed (an existing warehouse
  table's row count diverges from its manifest record — the analog of
  the reference's ``validate_existing_data_safety`` DB-vs-checkpoint
  comparison, which also exits 2)
* ``130`` — interrupted (Ctrl+C); progress is already durable because
  every completed stage is parquet + a manifest row, so re-running
  resumes exactly like the reference's checkpoint file promises

Usage::

    python -m netflix_data_ingestion_spark \
        --ratings combined_data_1.txt combined_data_2.txt \
        --movie-titles movie_titles.csv \
        --warehouse ./warehouse \
        [--date-range 1999-11-01 2005-12-31] [--validate-only]
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

logger = logging.getLogger("netflix_data_ingestion_spark")


def _build_parser() -> argparse.ArgumentParser:
    from netflix_data_ingestion_spark.plans import star

    p = argparse.ArgumentParser(
        prog="netflix_data_ingestion_spark",
        description="Build the Netflix star schema from raw rating files.",
    )
    p.add_argument(
        "--ratings",
        nargs="+",
        required=True,
        metavar="FILE",
        help="combined_data_*.txt rating files (movie-header block format)",
    )
    p.add_argument(
        "--movie-titles",
        required=True,
        metavar="FILE",
        help="movie_titles.csv (id,year,title with commas-in-title quirks)",
    )
    p.add_argument(
        "--warehouse",
        required=True,
        metavar="DIR",
        help="output directory for the parquet star schema + manifest",
    )
    p.add_argument(
        "--date-range",
        nargs=2,
        default=list(star.DEFAULT_DATE_RANGE),
        metavar=("START", "END"),
        help="dim_date coverage, ISO dates (default: %(default)s)",
    )
    p.add_argument(
        "--validate-only",
        action="store_true",
        help="only recount existing tables against the manifest, then exit",
    )
    return p


def _run_query(argv: list[str], spark=None) -> int:
    """``query`` subcommand: list or run any registered contract query.

    ::

        python -m netflix_data_ingestion_spark query list
        python -m netflix_data_ingestion_spark query pricing_summary \
            [--sf-dir DIR] [--limit N]

    Exit 0 on success, 1 for an unknown query name.  This is the ad-hoc
    surface over the full operator registry (plans/contract.REGISTRY) —
    the reference's psql-against-views workflow, minus the database.
    """
    from netflix_data_ingestion_spark.plans.contract import REGISTRY

    p = argparse.ArgumentParser(
        prog="netflix_data_ingestion_spark query",
        description="Run a registered contract query and print rows.",
    )
    p.add_argument("name", help="query name, or 'list' to enumerate")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if args.name == "list":
        for name in REGISTRY:
            print(name)
        return 0
    if args.name not in REGISTRY:
        logger.error(
            "unknown query %r (use 'query list'; %d registered)",
            args.name,
            len(REGISTRY),
        )
        return 1
    owns_session = spark is None
    try:
        if owns_session:
            from netflix_data_ingestion_spark.session import build_session

            spark = build_session(app_name=f"query-{args.name}")
        fn, _oracle = REGISTRY[args.name]
        df = fn(spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0
    finally:
        if owns_session and spark is not None:
            spark.stop()


def main(argv: list[str] | None = None, spark=None) -> int:
    """Run the star pipeline; returns a process exit code (see module doc).

    ``spark`` is injectable for tests (a passed-in session is NOT stopped
    on exit; a session this function creates is).
    """
    from netflix_data_ingestion_spark.pipeline import StarPipeline

    if argv is None:
        # ``python -m netflix_data_ingestion_spark ...`` calls main()
        # with no argv; resolve it here so the ``query`` dispatch below
        # sees the real command line (argparse would have done this
        # resolution itself, but only after the dispatch)
        argv = sys.argv[1:]
    if argv and argv[0] == "query":
        return _run_query(argv[1:], spark)

    args = _build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    t0 = time.time()
    owns_session = spark is None
    try:
        logger.info("=" * 60)
        logger.info("NETFLIX STAR SCHEMA - PYSPARK PIPELINE")
        logger.info("=" * 60)

        logger.info("[STEP 1/4] Initializing Spark session")
        if owns_session:
            from netflix_data_ingestion_spark.session import build_session

            spark = build_session(app_name="netflix-star-pipeline")

        pipe = StarPipeline(
            spark,
            args.warehouse,
            args.ratings,
            args.movie_titles,
            date_range=tuple(args.date_range),
        )

        logger.info("[STEP 2/4] Safety validation of existing warehouse")
        checks = pipe.validate()
        bad = sorted(name for name, ok in checks.items() if not ok)
        if bad:
            logger.error(
                "Safety check FAILED: table row counts diverge from the "
                "manifest: %s. Refusing to run to prevent compounding "
                "corruption (delete the tables or the manifest to rebuild).",
                ", ".join(bad),
            )
            return 2
        logger.info(
            "Safety check passed (%d completed table(s) verified)",
            len(checks),
        )
        if args.validate_only:
            return 0

        logger.info("[STEP 3/4] Running stages")
        results = pipe.run()
        for r in results:
            logger.info(
                "  stage %-18s %9d rows  %6.1fs%s",
                r.name,
                r.rows,
                r.seconds,
                "  (skipped: already complete)" if r.skipped else "",
            )

        logger.info("[STEP 4/4] Post-build validation")
        post = pipe.validate()
        post_bad = sorted(name for name, ok in post.items() if not ok)
        if post_bad:
            logger.error("Post-build validation failed for: %s", post_bad)
            return 1

        logger.info("=" * 60)
        logger.info(
            "PIPELINE COMPLETED SUCCESSFULLY in %.1fs (%d stages, %d run)",
            time.time() - t0,
            len(results),
            sum(1 for r in results if not r.skipped),
        )
        logger.info("=" * 60)
        return 0

    except KeyboardInterrupt:
        logger.warning("PIPELINE INTERRUPTED — completed stages are durable")
        logger.warning("(parquet + manifest); re-run to resume.")
        return 130

    except Exception:
        logger.exception("PIPELINE FAILED — completed stages are durable;")
        logger.error("fix the issue and re-run to resume.")
        return 1

    finally:
        if owns_session and spark is not None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())

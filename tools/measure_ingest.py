"""Ingest-throughput measurement against the reference's own workload shape.

Generates a synthetic Netflix-Prize-format dataset (interleaved
``MovieID:`` headers + ``Customer,Rating,Date`` detail lines across 4
files, comma-titled movie CSV), runs the full StarPipeline (parse ->
dims -> fact -> aggregates, partitioned parquet sinks), and prints one
JSON line with records/second — directly comparable to the reference's
published 8,500 rec/s fact-load / 12,345 rec/s dimension throughput
(BASELINE.md, README.md:302-306 of the reference).

Usage: python tools/measure_ingest.py [n_detail_rows] (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gen_file(args: tuple[str, int, int, int, int]) -> tuple[int, int]:
    """One input file's worth of blocks — independent RNG stream per
    file so the four files generate in parallel processes.  Detail
    lines are batched through ''.join: the per-line f.write() of the
    original generator was the wall (200M rows took ~25 min to
    generate single-threaded, dwarfing the measured pipeline)."""
    path, seed, first_mid, per_file, rows_budget = args
    rng = random.Random(seed)
    detail = 0
    mean_block = max(1, 2 * rows_budget // per_file // 2)
    with open(path, "w", buffering=1 << 20) as f:
        for b in range(per_file):
            mid = first_mid + b
            chunk = [f"{mid}:\n"]
            n = rng.randint(1, 2 * mean_block)
            for _ in range(n):
                if detail >= rows_budget:
                    break
                chunk.append(
                    f"{rng.randint(1, 480_000)},{rng.randint(1, 5)},"
                    f"{rng.randint(1999, 2005)}-"
                    f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}\n"
                )
                detail += 1
            f.write("".join(chunk))
    return first_mid + per_file - 1, detail


def generate(root: str, target_rows: int) -> tuple[list[str], str, int]:
    from multiprocessing import Pool

    n_movies = max(100, target_rows // 5600)  # ~reference blocks/ratings ratio
    per_file = n_movies // 4 or 1
    jobs = []
    for fi in range(4):
        jobs.append(
            (
                os.path.join(root, f"combined_data_{fi + 1}.txt"),
                7 + fi,
                fi * per_file + 1,
                per_file,
                target_rows // 4,
            )
        )
    with Pool(4) as pool:
        results = pool.map(_gen_file, jobs)
    mid = max(r[0] for r in results)
    detail = sum(r[1] for r in results)
    paths = [j[0] for j in jobs]
    movies_csv = os.path.join(root, "movie_titles.csv")
    with open(movies_csv, "w", buffering=1 << 20) as f:
        for m in range(1, mid + 1):
            f.write(f"{m},{1950 + m % 60},Movie {m}, The Sequel\n")
    return paths, movies_csv, detail


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from netflix_data_ingestion_spark.pipeline import StarPipeline
    from netflix_data_ingestion_spark.session import (
        INGEST_WORKER_WATCHDOG_CONF,
        build_session,
    )

    # SPARK_GRAFT_INGEST_DATA: persistent input dir — generation and
    # measurement can run as separate invocations (a 200M-row dataset
    # takes minutes to write; re-measuring shouldn't re-pay it).  A
    # _meta.json records (target, n_rows) so a size mismatch regenerates.
    keep = os.environ.get("SPARK_GRAFT_INGEST_DATA")
    gen_only = os.environ.get("SPARK_GRAFT_INGEST_GEN_ONLY") == "1"
    root = keep or tempfile.mkdtemp(prefix="ingest_bench_")
    meta_path = os.path.join(root, "_meta.json")
    try:
        meta = None
        if keep and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("target") != target:
                meta = None
        if meta is None:
            os.makedirs(root, exist_ok=True)
            t_gen = time.time()
            paths, movies_csv, n_rows = generate(root, target)
            meta = {
                "target": target,
                "paths": paths,
                "movies_csv": movies_csv,
                "n_rows": n_rows,
                "gen_s": round(time.time() - t_gen, 1),
            }
            if keep:
                with open(meta_path, "w") as f:
                    json.dump(meta, f)
        paths, movies_csv, n_rows = (
            meta["paths"], meta["movies_csv"], meta["n_rows"]
        )
        if gen_only:
            print(json.dumps({"generated": n_rows, "root": root,
                              "gen_s": meta.get("gen_s")}))
            return
        # watchdog: turn the recorded 1-in-4 800M dead-worker socket hang
        # into a prompt, diagnosable task failure (session.py rationale)
        spark = build_session(
            app_name="ingest-bench",
            extra_conf=INGEST_WORKER_WATCHDOG_CONF,
        )
        spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
        t0 = time.time()
        pipe = StarPipeline(
            spark, os.path.join(root, "warehouse"), paths, movies_csv
        )
        results = pipe.run()
        wall = time.time() - t0
        fact_rows = next(
            r.rows for r in results if r.name == "fact_ratings"
        )
        print(
            json.dumps(
                {
                    "metric": "netflix_ingest_records_per_second",
                    "value": round(n_rows / wall),
                    "unit": "rec/s",
                    "detail_rows": n_rows,
                    "fact_rows": fact_rows,
                    "wall_s": round(wall, 2),
                    "stages": {r.name: round(r.seconds, 2) for r in results},
                }
            )
        )
        spark.stop()
    finally:
        if keep:
            # persistent inputs stay; the warehouse must go (a stale
            # manifest would make the next run skip every stage)
            shutil.rmtree(os.path.join(root, "warehouse"), ignore_errors=True)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

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


def generate(root: str, target_rows: int) -> tuple[list[str], str, int]:
    rng = random.Random(7)
    n_movies = max(100, target_rows // 5600)  # ~reference blocks/ratings ratio
    per_file = n_movies // 4 or 1
    detail = 0
    paths = []
    mid = 0
    for fi in range(4):
        p = os.path.join(root, f"combined_data_{fi + 1}.txt")
        with open(p, "w") as f:
            for _ in range(per_file):
                mid += 1
                f.write(f"{mid}:\n")
                n = rng.randint(1, 2 * target_rows // n_movies)
                for _ in range(n):
                    if detail >= target_rows:
                        break
                    cid = rng.randint(1, 480_000)
                    f.write(
                        f"{cid},{rng.randint(1, 5)},"
                        f"{rng.randint(1999, 2005)}-"
                        f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}\n"
                    )
                    detail += 1
        paths.append(p)
    movies_csv = os.path.join(root, "movie_titles.csv")
    with open(movies_csv, "w") as f:
        for m in range(1, mid + 1):
            f.write(f"{m},{1950 + m % 60},Movie {m}, The Sequel\n")
    return paths, movies_csv, detail


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from netflix_data_ingestion_spark.pipeline import StarPipeline
    from netflix_data_ingestion_spark.session import build_session

    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        paths, movies_csv, n_rows = generate(root, target)
        spark = build_session(app_name="ingest-bench")
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
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Per-query optimization profiler (guide §1).

Times a named subset of registry queries in isolation with the noop sink
(2 reps, min + first), labels jobs, and optionally captures
``.explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/profile_queries.py [--plans TAG --suffix before] q1 q2 ...
    python tools/profile_queries.py --top N          # N most expensive from
                                                     # BENCH_FULL_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--plans", default=None, help="plans/<TAG>/ capture dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--record", default=os.path.join(REPO, "BENCH_FULL_r12.json"))
    args = ap.parse_args()

    from netflix_data_ingestion_spark.plans.contract import REGISTRY
    from netflix_data_ingestion_spark.session import build_session

    names = list(args.queries)
    if args.top:
        rec = json.load(open(args.record))
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = build_session(app_name="profile")
    spark.range(1000).selectExpr("sum(id)").collect()

    # same session-scoped warmups as bench.py so isolated numbers are
    # comparable to in-bench mins
    def _warm_py(batches):
        import numpy  # noqa: F401

        from netflix_data_ingestion_spark.operators import (  # noqa: F401
            audio, avi, gif, jpeg, mp4, multimodal,
        )
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_warm_py, "id long").collect()
    from netflix_data_ingestion_spark.sources.readers import (
        TESTDATA_TABLES, read_table,
    )
    for t in TESTDATA_TABLES:
        try:
            read_table(spark, SF_DIR, t).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass
    from netflix_data_ingestion_spark.plans import contract_llm
    try:
        contract_llm.warm_staged_models(spark, SF_DIR)
    except Exception:
        pass

    import gc

    plans_dir = None
    if args.plans:
        plans_dir = os.path.join(REPO, "plans", args.plans)
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        if plans_dir is not None:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(
                    plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for _rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{_rep}")
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"first": runs[0], "min": min(runs), "runs": runs}
        print(f"{min(runs):8.3f}  first={runs[0]:8.3f}  {name}", flush=True)
        gc.collect()
        spark.catalog.clearCache()

    print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()

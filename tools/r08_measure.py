#!/usr/bin/env python3
"""Round-8 optimization measurement harness (bench.py stays FROZEN).

Times the bench headline queries with the exact frozen-bench methodology
(one warm ``.count()`` then one timed ``.count()`` in a session built like
bench.py's) and additionally:

- captures ``.explain("formatted")`` for each query into
  ``plans/r08/<query>_<tag>.txt`` (the judge-facing plan evidence);
- optionally times a noop-sink run (guide §1.4) so the computation is
  separated from count()'s column pruning;
- can run any subset of queries (``--only a,b,c``) and repeat
  (``--repeats N``, reporting min like the bench does).

Usage:
  python tools/r08_measure.py --tag before [--only q1,q2] [--repeats 2]
         [--noop] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE_QUERIES = [
    "b1_html_extract",
    "b2_paragraphs",
    "o1_compose_vectors",
    "o6_confidence_agg",
    "o3_interval_merge",
    "events_sessionize",
    "pricing_summary",
    "monthly_revenue",
    "dedup_minhash_lsh",
    "dedup_cc_clusters",
    "quality_lm_nll",
    "text_tfidf_topk",
    "curate_assemble_neardup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = (
        [n for n in args.only.split(",") if n]
        if args.only
        else HEADLINE_QUERIES
    )

    from doc_parser_spark.session import get_spark

    # mirror bench.py's _make_session(CPUS)
    spark = get_spark(
        app_name=f"r08_measure_{args.tag}",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        files_max_partition_bytes="4m",
    )
    from doc_parser_spark.plans.driver_queries import QUERIES

    plans_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        if not args.no_plans:
            plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        fn(spark, SF_DIR).count()  # warm (frozen-bench methodology)
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            walls.append(time.perf_counter() - t0)
        rec: dict = {"count_s": round(min(walls), 4)}
        if args.repeats > 1:
            rec["count_samples"] = [round(w, 4) for w in walls]
        if args.noop:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            rec["noop_s"] = round(time.perf_counter() - t0, 4)
        out[name] = rec
        print(f"{name}: {rec}", flush=True)
        spark.sparkContext.setJobDescription(None)

    total = round(sum(r["count_s"] for r in out.values()), 4)
    print(json.dumps({"tag": args.tag, "sf_dir": SF_DIR, "total_count_s": total,
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

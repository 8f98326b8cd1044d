#!/usr/bin/env python3
"""Capture the extraction path's physical plan (round-8 evidence).

bench.py's extract_turns_local32 entry is an operator call, not a QUERIES
row, so tools/r08_measure.py does not cover it. This writes
``plans/r08/extract_turns_<tag>.txt`` with the ``explain("formatted")`` of
the exact frame bench.py times (same corpus builder, same route_partitions
formula) plus a timed count with the frozen-bench warm-then-time
methodology.

Usage: python tools/r08_extract_plan.py --tag before|after
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="after")
    args = ap.parse_args()

    import tempfile

    from doc_parser_spark.session import get_spark
    from doc_parser_spark.operators.extract import extract_turns
    from doc_parser_spark.sources.transcripts import write_transcripts_parquet

    # same corpus bench.py builds: sf0.1 → 6000 convs × ~10 turns, seed 42
    sf = 0.1 if SF_DIR.rstrip("/").endswith("sf0.1") else 0.01
    tmp = tempfile.mkdtemp(prefix="r08_extract_plan_")
    transcripts_path = os.path.join(tmp, "transcripts.parquet")
    write_transcripts_parquet(
        transcripts_path, n_convs=max(100, int(60000 * sf)), turns_mean=10,
        seed=42,
    )

    spark = get_spark(
        app_name=f"r08_extract_plan_{args.tag}",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        files_max_partition_bytes="4m",
    )
    df = spark.read.parquet(transcripts_path)
    rp = 2 * CPUS
    out = extract_turns(df, route_partitions=rp)

    plans_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(plans_dir, f"extract_turns_{args.tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path}")

    spark.sparkContext.setJobDescription(f"extract_turns [{args.tag}]")
    extract_turns(df.limit(256), route_partitions=rp).count()  # warm
    t0 = time.perf_counter()
    n = out.count()
    wall = time.perf_counter() - t0
    print(f"extract_turns: rows={n} wall={wall:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

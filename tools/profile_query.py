#!/usr/bin/env python
"""Per-stage decomposition of a registered query's noop-sink execution.

Runs a query N times against the noop sink with the bench session knobs
(AQE off, shuffle partitions like bench.py) and prints, from the live
UI REST API, the per-stage wall/dominant metrics of the LAST run plus
the per-run walls — the guide §1 empirical loop without eventlog
parsing.

Usage: python tools/profile_query.py q1_pricing_summary [more ...]
         [--sf-dir DIR] [--runs N] [--aqe]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--aqe", action="store_true")
    ap.add_argument("--shuffle", default="8")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    # UI must be on BEFORE session construction for the REST API
    os.environ["SPARK_GRAFT_PROFILE_UI"] = "1"
    from pyspark.sql import SparkSession
    from radio_data_pipeline_spark.plans.registry import (
        all_queries, release_deferred)
    from radio_data_pipeline_spark.session import get_spark

    SparkSession.builder.config("spark.ui.enabled", "true")
    # get_spark sets ui.enabled false; override by building first
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.appName("rdps-profile")
             .master(f"local[{cpus}]")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4049")
             .getOrCreate())
    # then apply the engine defaults on top of the live session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled",
                   "true" if args.aqe else "false")
    spark.conf.set("spark.sql.shuffle.partitions", args.shuffle)

    queries = all_queries()
    base = "http://localhost:4049/api/v1"
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{base}/applications/{app_id}{path}") \
                as r:
            return json.load(r)

    for name in args.names:
        df = queries[name](spark, args.sf_dir)
        sc = spark.sparkContext
        walls = []
        for i in range(args.runs):
            sc.setJobDescription(f"{name} run {i}")
            before_jobs = {j["jobId"] for j in rest("/jobs")}
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        # stages of the LAST run's jobs
        last_jobs = [j for j in rest("/jobs")
                     if j["jobId"] not in before_jobs]
        stage_ids = sorted({s for j in last_jobs for s in j["stageIds"]})
        print(f"\n=== {name}  walls: "
              f"{[round(w, 3) for w in walls]}  "
              f"(min {min(walls):.3f})  jobs_last_run={len(last_jobs)}")
        for sid in stage_ids:
            try:
                st = rest(f"/stages/{sid}")[0]
            except Exception:
                continue
            dur = (st.get("executorRunTime", 0)) / 1000.0
            sub = st.get("submissionTime", "")
            comp = st.get("completionTime", "")
            print(f"  stage {sid}: tasks={st['numCompleteTasks']} "
                  f"execRunTime={dur:.3f}s "
                  f"shuffleR={st.get('shuffleReadBytes', 0) >> 10}KiB "
                  f"shuffleW={st.get('shuffleWriteBytes', 0) >> 10}KiB "
                  f"input={st.get('inputBytes', 0) >> 10}KiB  "
                  f"{st.get('name', '')[:70]}")
        release_deferred()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Count Spark JOBS (and their stage counts) per warm noop-sink run of
registered queries — the guide §1 empirical probe for fixed per-run
overhead at toy scale. A query whose plan triggers extra driver jobs
per execution (range-partitioning boundary sampling, broadcast builds)
pays a scheduler round-trip per job per run; at sf0.1 that overhead is
the dominant cost, and on a cluster each is a driver latency bubble.

Usage: python tools/count_jobs.py q1_pricing_summary [more ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    from radio_data_pipeline_spark.plans.registry import (
        all_queries, release_deferred)
    from radio_data_pipeline_spark.session import get_spark

    spark = get_spark("rdps-count-jobs")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    queries = all_queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        df = queries[name](spark, SF_DIR)
        # warm once (codegen, broadcasts)
        df.write.format("noop").mode("overwrite").save()
        all_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        all_after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(all_after - all_before)
        stages = []
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            stages.append(len(info.stageIds) if info else -1)
        print(f"{name}: wall={wall:.3f}s jobs={len(new_jobs)} "
              f"stages_per_job={stages}")
        release_deferred()


if __name__ == "__main__":
    main()

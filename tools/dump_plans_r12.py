#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of registered queries into
plans/r11/<query>_<suffix>.txt — the optimization round's before/after
plan evidence.

Usage: python tools/dump_plans_r12.py before [query ...]
       python tools/dump_plans_r12.py after  [query ...]

With no query list, dumps the bench HEADLINE set. Mirrors bench.py's
session knobs (AQE off, auto shuffle partitions) so the captured plan
is the plan the bench actually times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "orders_rank_in_customer",
    "events_sessionize",
    "events_asof_prior_view",
    "vector_sum",
    "vector_elementwise_sum",
    "cosine_topk",
    "ivf_topk",
    "minhash_lsh_pairs",
    "dedup_exact",
    "simhash_docs",
    "pricing_cube",
    "events_tumbling_counts",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE

    from radio_data_pipeline_spark.plans.registry import (
        all_queries, release_deferred)
    from radio_data_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    spark = get_spark("rdps-plan-dump")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # mirror bench auto shuffle partitions for sf0.1 (resolves to 8)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    queries = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
        release_deferred()


if __name__ == "__main__":
    main()

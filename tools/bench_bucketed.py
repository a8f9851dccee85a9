#!/usr/bin/env python
"""Reproduce the BENCH_SCALING §10 bucketed-join measurement: write
orders/lineitem as orderkey-bucketed sorted tables (the one-time
layout cost), then time the q5-shaped star join against the raw
shuffled form and assert the bucketed plan has NO exchange below the
fact-fact join.

    python tools/bench_bucketed.py [sf_dir] [n_buckets] [runs]

Defaults: /root/repo/.bench_scale/sf10, 32 buckets, 3 runs. Prints
one JSON line. The bucketed tables are dropped afterward.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.bench_scale/sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    os.environ.setdefault("SPARK_GRAFT_BENCH", "1")
    from pyspark.sql import functions as F

    from radio_data_pipeline_spark.session import get_spark
    from radio_data_pipeline_spark.sources.bucketed import (
        bucketed_join_ready,
        write_bucketed,
    )

    spark = get_spark("bench-bucketed")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def q5(li, o):
        r = spark.read.parquet(f"{sf_dir}/region.parquet") \
            .filter(F.col("r_name") == "ASIA")
        n = spark.read.parquet(f"{sf_dir}/nation.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                  & (s.s_nationkey == n.n_nationkey))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))

    def best(df):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3), [round(t, 3) for t in ts]

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    shuffled_best, shuffled_all = best(q5(lineitem, orders))

    t0 = time.perf_counter()
    write_bucketed(orders.select("o_orderkey", "o_custkey"),
                   "bb_orders", ["o_orderkey"], n_buckets,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "bb_lineitem", ["l_orderkey"], n_buckets,
                   sort_cols=["l_orderkey"])
    layout_cost = round(time.perf_counter() - t0, 1)
    try:
        o_b, li_b = bucketed_join_ready(spark, "bb_orders", "bb_lineitem")
        bq5 = q5(li_b, o_b)
        plan = bq5._jdf.queryExecution().executedPlan().toString()
        no_fact_exchange = (
            "Exchange hashpartitioning(l_orderkey" not in plan
            and "Exchange hashpartitioning(o_orderkey" not in plan)
        if not no_fact_exchange:
            # the measurement is meaningless if either fact side still
            # shuffles — fail loudly instead of printing a "bucketed"
            # number that includes an exchange
            raise SystemExit(
                "bucketed plan still contains a fact-side exchange:\n"
                + plan[:2000])
        bucketed_best, bucketed_all = best(bq5)
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_orders")
        spark.sql("DROP TABLE IF EXISTS bb_lineitem")

    print(json.dumps({
        "metric": "bucketed_vs_shuffled_q5",
        "sf_dir": sf_dir, "n_buckets": n_buckets, "runs": runs,
        "shuffled_best_sec": shuffled_best, "shuffled_all": shuffled_all,
        "bucketed_best_sec": bucketed_best, "bucketed_all": bucketed_all,
        "one_time_layout_sec": layout_cost,
        "bucketed_plan_has_no_fact_exchange": no_fact_exchange,
    }))


if __name__ == "__main__":
    main()

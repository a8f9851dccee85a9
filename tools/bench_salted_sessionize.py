#!/usr/bin/env python
"""Salted sessionization under a hot key (BENCH_SCALING §12 addendum):
does salting the window key by a calendar bucket actually drop the
hot key's single-task bound?

Corpus: synthetic events, HALF of them belonging to ONE user, spread
over ~100 days — the shape where the plain per-user window must sort
all of the hot user's rows in one task (the §12 note: at a 100 TB
corpus a 1% hot key is ~1 TB of single-task sort; here we make the
skew extreme enough to measure at local[32] scale). The salted form
partitions the heavy window by (user, day): the hot user becomes ~100
independent tasks plus a 100-row stitch.

Usage: python tools/bench_salted_sessionize.py [n_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.operators.skew import (  # noqa: E402
    salted_sessionize,
)
from radio_data_pipeline_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DAY_US = 86_400_000_000
GAP_US = 30 * 60 * 1_000_000
SPAN_DAYS = 100


def main() -> None:
    spark = get_spark("bench-salted-sessionize")
    base = spark.range(N).select(
        F.col("id").alias("eid"),
        # half the rows -> user 0 (the hot key); rest spread over 10k
        F.when(F.col("id") % 2 == 0, F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)) + 1)
         .alias("user"),
        # event times scattered across the span, ~34k hot events/day
        F.pmod(F.xxhash64("id", F.lit(1)),
               F.lit(SPAN_DAYS * DAY_US)).alias("ts"))
    base = base.persist()
    base.count()

    def unsalted():
        w = Window.partitionBy("user").orderBy("ts", "eid")
        wrun = w.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)
        prev = F.lag("ts").over(w)
        return (base.withColumn(
            "_f", F.when(prev.isNull() | (F.col("ts") - prev > GAP_US),
                         1).otherwise(0))
            .withColumn("session_id", F.sum("_f").over(wrun)))

    def salted():
        return salted_sessionize(
            base, "user", "ts", GAP_US,
            bucket=F.floor(F.col("ts") / DAY_US),
            tiebreak_cols=("eid",))

    for label, fn in [("unsalted per-user window", unsalted),
                      ("salted by day (salted_sessionize)", salted)]:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            out = fn()
            agg = (out.groupBy("user")
                   .agg(F.max("session_id").alias("n"))
                   .agg(F.sum("n")).collect()[0][0])
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best {best:.2f}s (total sessions {agg})",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

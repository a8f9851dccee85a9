#!/usr/bin/env python
"""semantic_dedup assignment-cost scaling (BENCH_SCALING §17): is the
auto-cluster mode sub-quadratic after the two-level fix?

The r5 verdict's hazard: flat Lloyd assignment joins N·d exploded rows
with all k·d centroid rows — O(N·k·d) partials — and auto mode grows
k = ceil(N/256) linearly with N, so the FINAL assignment (which
train_fraction cannot discount) is O(N²·d/256): quadratic. The fix
routes assignment through a ~sqrt(k)-centroid coarse quantizer
(two_level=True, auto above 64 clusters), making it O(N^1.5·d/16).

Method: run library-default semantic_dedup (auto k, lloyd_rounds=2,
dedup_identical=True) on the 10x and 100x embeddings corpora
(.bench_scale/sf1 = 20k rows, sf10 = 200k rows, d=64), timing the full
verdict materialization (groupBy(is_kept).count). At 10x also run the
OLD flat path (two_level=False) for a same-scale comparison; at 100x
the flat path's final assignment alone is 200k x 782 x 64 = 1.0e10
join partials — run it only with FLAT_AT_100X=1 and a long budget.

Predicted partial-row counts (N·k_eff·d) are printed next to measured
wall time so the sub-quadratic claim is checkable against the model,
not just the clock.

Usage: python tools/bench_semantic_dedup.py [scale_dir ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radio_data_pipeline_spark.functions.similarity import (  # noqa: E402
    semantic_dedup,
)
from radio_data_pipeline_spark.session import get_spark  # noqa: E402

SCALES = sys.argv[1:] or ["/root/repo/.bench_scale/sf1",
                          "/root/repo/.bench_scale/sf10"]
TARGET = 256
DIM = 64


def run(df, n, label, two_level):
    t0 = time.monotonic()
    out = semantic_dedup(df, eps=0.8, n_clusters=None,
                         target_cluster_rows=TARGET,
                         two_level=two_level)
    stats = {r["is_kept"]: r["count"]
             for r in out.groupBy("is_kept").count().collect()}
    dt = time.monotonic() - t0
    k = max(1, math.ceil(n / TARGET))
    if two_level:
        k_eff = max(2, math.isqrt(k)) + max(1, k // max(2, math.isqrt(k)))
    else:
        k_eff = k
    print(f"{label}: n={n} k={k} wall={dt:.2f}s "
          f"~final-assign partials={n * k_eff * DIM:.3g} "
          f"kept={stats.get(True, 0)} removed={stats.get(False, 0)}",
          flush=True)
    return dt


def main() -> None:
    spark = get_spark("bench-semantic-dedup")
    times = {}
    for sf_dir in SCALES:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        emb = emb.select("vec_id", "embedding")
        n = emb.count()
        name = os.path.basename(sf_dir.rstrip("/"))
        times[(name, "two_level")] = run(
            emb, n, f"{name} two-level (forced)", two_level=True)
        if n <= 50_000 or os.environ.get("FLAT_AT_100X") == "1":
            times[(name, "flat")] = run(
                emb, n, f"{name} flat (forced)", two_level=False)
    keys = [k for k in times if k[1] == "two_level"]
    if len(keys) >= 2:
        keys.sort()
        a, b = times[keys[0]], times[keys[1]]
        print(f"growth two-level {keys[0][0]}->{keys[1][0]}: "
              f"{b / a:.1f}x wall for 10x rows "
              f"(quadratic model predicts ~100x, N^1.5 ~31.6x)",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Persisted-index ANN probes + batch knn_join at the 100x decade
(BENCH_SCALING §15 addendum 3 / r5 verdict #4).

Round 5 measured the indexed probes' plan pruning and the knn_join
skew guard at 10x; this closes the missing decade: build the
layout-as-index datasets over .bench_scale/sf10 embeddings (200k
rows, d=64), then measure

- ivf_topk_indexed: wall per probe, directories pruned (nprobe of
  n_centroids, read off the scan's PartitionFilters + disk layout);
- lsh_multiprobe_topk_indexed: wall + recall@10 vs the brute-force
  cosine ground truth across the probe schedule (1/2/4/8 of 2^12
  buckets) — the Lv-2007 recall-recovery curve at 100x;
- knn_join: 1,000-query batch against the 200k corpus, default
  bucket_cap, auto planes.

Usage: python tools/bench_indexed_ann_100x.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.functions.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk_indexed,
    knn_join,
    lsh_multiprobe_topk_indexed,
    write_ivf_index,
    write_lsh_index,
)
from radio_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_scale/sf10"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_100x"
N_CENTROIDS = 64
NPROBE = 4
N_PLANES = 12          # auto_n_planes(200k, target 64) -> 12 (4096 buckets)
K = 10
N_QUERIES = 20


def main() -> None:
    spark = get_spark("bench-indexed-ann-100x")
    emb = (spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n = emb.count()
    print(f"corpus: {n} vectors", flush=True)

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    ivf_path = os.path.join(WORK, "ivf")
    lsh_path = os.path.join(WORK, "lsh")
    t0 = time.monotonic()
    write_ivf_index(emb, ivf_path, n_centroids=N_CENTROIDS)
    t_ivf = time.monotonic() - t0
    t0 = time.monotonic()
    write_lsh_index(emb, lsh_path, n_planes=N_PLANES)
    t_lsh = time.monotonic() - t0
    ivf_dirs = len(glob.glob(f"{ivf_path}/ivf_list=*"))
    lsh_dirs = len(glob.glob(f"{lsh_path}/lsh_bucket=*"))
    print(f"index build: ivf {t_ivf:.1f}s ({ivf_dirs} dirs), "
          f"lsh {t_lsh:.1f}s ({lsh_dirs} dirs)", flush=True)

    # out-of-sample queries: spread across the id range (the corpus
    # is label-clustered — consecutive ids share a tight cluster) and
    # PERTURBED with seeded noise so true neighbors can straddle
    # hyperplanes; unperturbed in-corpus queries sit at their
    # cluster's center and make every probe schedule score a
    # meaningless recall of 1.0
    import numpy as np
    rng = np.random.default_rng(31)
    stride = n // N_QUERIES
    base_q = (emb.filter(F.col("vec_id") % stride == 0)
              .orderBy("vec_id").limit(N_QUERIES).collect())
    queries = []
    for r in base_q:
        v = np.asarray(r["embedding"], dtype=float)
        v = v + rng.normal(0, 0.35 * np.linalg.norm(v) / np.sqrt(len(v)),
                           len(v))
        queries.append((int(r["vec_id"]), [float(x) for x in v]))

    # ground truth: brute-force cosine top-k per query
    truth = {}
    t0 = time.monotonic()
    for qid, qv in queries:
        rows = cosine_topk(emb, qv, k=K).collect()
        truth[qid] = {r["vec_id"] for r in rows}
    t_bf = (time.monotonic() - t0) / len(queries)
    print(f"brute-force baseline: {t_bf:.2f}s/query", flush=True)

    # IVF indexed probe (one warmup probe first: the FIRST read of a
    # partitioned dataset pays the cold directory listing; steady
    # state is what a serving loop sees)
    import re
    ivf_topk_indexed(spark, ivf_path, queries[0][1], k=K,
                     n_centroids=N_CENTROIDS, nprobe=NPROBE).collect()
    t0 = time.monotonic()
    for qid, qv in queries:
        ivf_topk_indexed(spark, ivf_path, qv, k=K,
                         n_centroids=N_CENTROIDS, nprobe=NPROBE).collect()
    t_probe = (time.monotonic() - t0) / len(queries)
    plan = ivf_topk_indexed(spark, ivf_path, queries[0][1], k=K,
                            n_centroids=N_CENTROIDS, nprobe=NPROBE) \
        ._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = bool(m and "ivf_list" in m.group(1) and "IN" in m.group(1))
    print(f"ivf_topk_indexed: {t_probe:.2f}s/query, probes {NPROBE} of "
          f"{ivf_dirs} dirs, plan partition-pruned={pruned} "
          f"({m.group(1)[:60] if m else 'no PartitionFilters'})",
          flush=True)

    # LSH multi-probe schedule: recall + wall (warmup read first —
    # without it the first schedule measured pays the whole dataset's
    # cold 1,475-directory listing and the curve reads backwards)
    lsh_multiprobe_topk_indexed(spark, lsh_path, queries[0][1], k=K,
                                n_planes=N_PLANES, n_probes=1).collect()
    for n_probes in (1, 2, 4, 8):
        hits = tot = 0
        t0 = time.monotonic()
        for qid, qv in queries:
            got = {r["vec_id"] for r in lsh_multiprobe_topk_indexed(
                spark, lsh_path, qv, k=K, n_planes=N_PLANES,
                n_probes=n_probes).collect()}
            hits += len(got & truth[qid])
            tot += len(truth[qid])
        dt = (time.monotonic() - t0) / len(queries)
        print(f"lsh_multiprobe_topk_indexed probes={n_probes} of "
              f"{lsh_dirs} dirs: {dt:.2f}s/query, "
              f"recall@{K}={hits / tot:.2f}", flush=True)

    # batch knn_join: 1,000 queries x 200k corpus, library defaults
    q_batch = emb.orderBy("vec_id").limit(1000)
    t0 = time.monotonic()
    cnt = knn_join(q_batch, emb, k=5, n_probes=2).count()
    t_join = time.monotonic() - t0
    print(f"knn_join 1000q x {n}: {t_join:.1f}s ({cnt} result rows)",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

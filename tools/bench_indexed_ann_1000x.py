#!/usr/bin/env python
"""Persisted-index ANN probes + batch knn_join at the 1000x decade
(BENCH_SCALING §15 addendum 4).

Extends addendum 3 (100x, 200k vectors) to .bench_scale/sf100
embeddings (2M rows, d=64), and measures BOTH probe modes:

- path probes: every call re-reads the dataset path (pays partition
  re-listing — the cost addendum 3 found dominating at high dir
  counts);
- handle probes: one open_index() DataFrame reused across the loop
  (the round-6 closure; steady-state serving shape).

Same out-of-sample query methodology as the 100x tool (id-spread,
seeded perturbation — in-corpus queries score a fake recall of 1.0
on this label-clustered synthetic corpus).

Usage: python tools/bench_indexed_ann_1000x.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import glob
import os
import re
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
    open_index,
    write_ivf_index,
    write_lsh_index,
)
from radio_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_scale/sf100"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_1000x"
N_CENTROIDS = 64
NPROBE = 4
N_PLANES = 12          # fixed to addendum 3's layout for comparability:
                       # same 4,096-dir tree, 10x the rows per dir
K = 10
N_QUERIES = 20


def main() -> None:
    spark = get_spark("bench-indexed-ann-1000x")
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

    truth = {}
    t0 = time.monotonic()
    for qid, qv in queries:
        rows = cosine_topk(emb, qv, k=K).collect()
        truth[qid] = {r["vec_id"] for r in rows}
    t_bf = (time.monotonic() - t0) / len(queries)
    print(f"brute-force baseline: {t_bf:.2f}s/query", flush=True)

    # ---- IVF: path mode (per-call re-listing) vs handle mode
    ivf_topk_indexed(spark, ivf_path, queries[0][1], k=K,
                     n_centroids=N_CENTROIDS, nprobe=NPROBE).collect()
    t0 = time.monotonic()
    for qid, qv in queries:
        ivf_topk_indexed(spark, ivf_path, qv, k=K,
                         n_centroids=N_CENTROIDS, nprobe=NPROBE).collect()
    t_path = (time.monotonic() - t0) / len(queries)
    t0 = time.monotonic()
    ivf_h = open_index(spark, ivf_path)
    t_open_ivf = time.monotonic() - t0
    t0 = time.monotonic()
    for qid, qv in queries:
        ivf_topk_indexed(spark, ivf_h, qv, k=K,
                         n_centroids=N_CENTROIDS, nprobe=NPROBE).collect()
    t_handle = (time.monotonic() - t0) / len(queries)
    plan = ivf_topk_indexed(spark, ivf_h, queries[0][1], k=K,
                            n_centroids=N_CENTROIDS, nprobe=NPROBE) \
        ._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = bool(m and "ivf_list" in m.group(1) and "IN" in m.group(1))
    print(f"ivf_topk_indexed: path {t_path:.2f}s/q, handle "
          f"{t_handle:.2f}s/q (open {t_open_ivf:.2f}s), probes {NPROBE} "
          f"of {ivf_dirs} dirs, pruned={pruned}", flush=True)

    # ---- LSH multi-probe schedule: recall + wall, handle mode; one
    # path-mode row at probes=4 to show the re-listing cost at 1000x
    lsh_h = open_index(spark, lsh_path)
    lsh_multiprobe_topk_indexed(spark, lsh_h, queries[0][1], k=K,
                                n_planes=N_PLANES, n_probes=1).collect()
    for n_probes in (1, 2, 4, 8):
        hits = tot = 0
        t0 = time.monotonic()
        for qid, qv in queries:
            got = {r["vec_id"] for r in lsh_multiprobe_topk_indexed(
                spark, lsh_h, qv, k=K, n_planes=N_PLANES,
                n_probes=n_probes).collect()}
            hits += len(got & truth[qid])
            tot += len(truth[qid])
        dt = (time.monotonic() - t0) / len(queries)
        print(f"lsh_multiprobe handle probes={n_probes} of {lsh_dirs} "
              f"dirs: {dt:.2f}s/query, recall@{K}={hits / tot:.2f}",
              flush=True)
    t0 = time.monotonic()
    for qid, qv in queries[:5]:
        lsh_multiprobe_topk_indexed(spark, lsh_path, qv, k=K,
                                    n_planes=N_PLANES,
                                    n_probes=4).collect()
    print(f"lsh_multiprobe PATH probes=4: "
          f"{(time.monotonic() - t0) / 5:.2f}s/query (re-listing)",
          flush=True)

    # ---- batch knn_join: 1,000 queries x 2M corpus, library defaults
    q_batch = emb.orderBy("vec_id").limit(1000)
    t0 = time.monotonic()
    cnt = knn_join(q_batch, emb, k=5, n_probes=2).count()
    t_join = time.monotonic() - t0
    print(f"knn_join 1000q x {n}: {t_join:.1f}s ({cnt} result rows)",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

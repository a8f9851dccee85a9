#!/usr/bin/env python
"""Incremental SEMANTIC dedup ingest cost vs accumulated corpus
(BENCH_SCALING §19): does admitting a fixed-size micro-batch through
streaming/semantic.py get more expensive as the indexed corpus grows,
and what do the two maintenance ops (compaction, requantize) buy?

Method — the §16 band-index study transposed to the semantic tier:
bulk-seed the (id, v, cell) index from an embeddings corpus in
stages, each stage written as many ingest_batch dirs to mimic
accumulated micro-batch appends; after each stage, time the full
per-batch kernel (frozen-quantizer assignment + batch-local SemDeDup
+ cell-pruned index probe + survivors count) for the SAME fresh probe
batch. The quantizer is trained ONCE up front at the auto-scale k for
the full corpus (ceil(N/256)) — per-batch assignment cost is
O(|batch|·k·d) regardless of how much corpus the index holds, so any
growth the clock shows is the PROBE side: within-cell candidate rows
grow as corpus/k (the SemDeDup serving trade documented in
streaming/semantic.py) plus directory/file-count overhead, which
compaction bounds and requantize resets by raising k.

EVERY probe measurement runs in a FRESH subprocess: the first sf10
run of this study measured probes in the seeding session and saw
40 -> 75 -> 88 s on an IDENTICAL index content across phases — pure
accumulated-session contamination (the §10 cold-read lesson's twin),
which in-process best-of-N cannot see past.

Usage: python tools/bench_semantic_ingest.py [corpus_dir] [work_dir]
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_ROWS = 2_000
EPS = 0.8
TARGET = 256  # auto-scale rows/cluster (library default)
DIRS_PER_STAGE = 10  # micro-batch dirs per seeding stage
# Lloyd training sample (quantizer quality knob, not a correctness
# one); drop it for the 1000x decade where training dominates setup
TRAIN_FRACTION = float(os.environ.get("SEM_INGEST_TRAIN_FRACTION",
                                      "0.2"))


def probe_subprocess(corpus: str, index: str, label: str) -> None:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe-only",
         corpus, index],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("PROBE")][-1]
    print(f"  probe[{label}]: {line.split(None, 1)[1]}")


def run_probe_only(corpus: str, index: str) -> None:
    from pyspark.sql import functions as F

    from radio_data_pipeline_spark.session import get_spark
    from radio_data_pipeline_spark.streaming.semantic import (
        semantic_dedup_batch_against_index,
    )

    spark = get_spark("bench-semantic-ingest-probe")
    emb = (spark.read.parquet(os.path.join(corpus, "embeddings.parquet"))
           .select("vec_id", "embedding"))
    batch = (emb.orderBy("vec_id").limit(PROBE_ROWS)
             .withColumn("vec_id", F.col("vec_id") + 100_000_000))
    batch.persist().count()
    best, surv = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        s, rows = semantic_dedup_batch_against_index(
            batch, index, 9_999, eps=EPS)
        n = s.count()
        best = min(best, time.monotonic() - t0)
        rows.unpersist()
        surv = n
    n_dirs = sum(1 for d in os.listdir(index)
                 if d.startswith("ingest_batch="))
    print(f"PROBE {best:.2f}s best-of-2 (fresh session), "
          f"survivors={surv}/{PROBE_ROWS}, dirs={n_dirs}")


def main() -> None:
    from pyspark.sql import functions as F

    from radio_data_pipeline_spark.functions.similarity import (
        assign_to_centroids,
        l2_norm,
    )
    from radio_data_pipeline_spark.session import get_spark
    from radio_data_pipeline_spark.streaming.semantic import (
        compact_semantic_index,
        init_semantic_index,
        read_semantic_quantizer,
        requantize_semantic_index,
    )

    corpus = (sys.argv[1] if len(sys.argv) > 1
              else "/root/repo/.bench_scale/sf10")
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sem_ingest_bench"
    spark = get_spark("bench-semantic-ingest")
    emb = (spark.read.parquet(os.path.join(corpus, "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n_total = emb.count()
    k = max(1, math.ceil(n_total / TARGET))

    if os.path.exists(work):
        shutil.rmtree(work)
    index = os.path.join(work, "sem_index")

    t0 = time.monotonic()
    resolved = init_semantic_index(
        emb, index, n_clusters=k, lloyd_rounds=2, train_fraction=TRAIN_FRACTION)
    t_train = time.monotonic() - t0
    print(f"corpus={corpus} N={n_total} k={k} "
          f"two_level={resolved['two_level']} "
          f"coarse={resolved['coarse_clusters']} "
          f"train({TRAIN_FRACTION} sample, 2 rounds)={t_train:.1f}s")

    # bulk-seed: one corpus-wide assignment, sliced into stages by
    # md5-uniform classes (id layout independent), each stage written
    # as DIRS_PER_STAGE ingest_batch dirs to mimic real appends
    cents, meta = read_semantic_quantizer(spark, index)
    a = assign_to_centroids(emb, cents,
                            two_level=meta["two_level"],
                            coarse_clusters=meta["coarse_clusters"])
    assigned = (emb.join(a, "vec_id")
                .select(F.col("vec_id").alias("id"),
                        F.col("embedding").cast("array<double>")
                        .alias("v"),
                        F.col("cluster").alias("cell"))
                .withColumn("vn", l2_norm(F.col("v")))
                .withColumn("cell_bucket",
                            F.pmod(F.col("cell"),
                                   F.lit(meta["n_cell_buckets"]))
                            .cast("int")))
    assigned.persist()
    t0 = time.monotonic()
    assigned.count()
    print(f"bulk corpus assignment: {time.monotonic() - t0:.1f}s")
    mod = (F.conv(F.substring(F.md5(F.col("id").cast("string")),
                              1, 8), 16, 10)
           % (3 * DIRS_PER_STAGE)).cast("int")
    assigned = assigned.withColumn("_m", mod)

    bounds = [3, 9, 30]  # cumulative 30ths: 10%, 30%, 100%
    done = 0
    bid = 0
    for b in bounds:
        for m in range(done, b):
            (assigned.filter(F.col("_m") == m).drop("_m")
             .withColumn("src_batch", F.lit(bid))
             .repartition(F.col("cell_bucket"))
             .write.mode("overwrite").partitionBy("cell_bucket")
             .parquet(f"{index}/ingest_batch={bid}"))
            bid += 1
        done = b
        frac = b / bounds[-1]
        n_idx = int(n_total * frac)
        probe_subprocess(corpus, index,
                         f"{int(frac * 100)}% (~{n_idx} rows)")

    t0 = time.monotonic()
    folded = compact_semantic_index(spark, index)
    t_c = time.monotonic() - t0
    print(f"compaction: folded {folded} dirs in {t_c:.1f}s")
    probe_subprocess(corpus, index, "100%, compacted")

    t0 = time.monotonic()
    requantize_semantic_index(spark, index, n_clusters=k,
                              lloyd_rounds=2, train_fraction=TRAIN_FRACTION)
    t_r = time.monotonic() - t0
    print(f"requantize (k={k}, full-corpus retrain+refile): {t_r:.1f}s")
    probe_subprocess(corpus, index, "100%, requantized")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe-only":
        run_probe_only(sys.argv[2], sys.argv[3])
    else:
        main()

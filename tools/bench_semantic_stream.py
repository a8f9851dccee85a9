#!/usr/bin/env python
"""Streaming semantic-ingest throughput (BENCH_SCALING §19 add. 3):
docs/second through stream_semantic_ingest end to end — quantizer
assignment, batch-local SemDeDup, cell-pruned index probe, survivor
write, index append — under Structured Streaming's real foreachBatch
machinery (availableNow + maxFilesPerTrigger=1 gives deterministic
micro-batch boundaries).

Usage: python tools/bench_semantic_stream.py [corpus_dir] [work_dir]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.session import get_spark  # noqa: E402
from radio_data_pipeline_spark.streaming.semantic import (  # noqa: E402
    init_semantic_index,
    stream_semantic_ingest,
)

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_scale/sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sem_stream_bench"
N_BATCHES = 10
EPS = 0.8
TARGET = 256


def main() -> None:
    spark = get_spark("bench-semantic-stream")
    emb = (spark.read.parquet(os.path.join(CORPUS, "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n = emb.count()
    k = max(1, math.ceil(n / TARGET))

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    src = os.path.join(WORK, "src")
    index = os.path.join(WORK, "idx")
    out = os.path.join(WORK, "survivors")
    cp = os.path.join(WORK, "cp")

    t0 = time.monotonic()
    init_semantic_index(emb, index, n_clusters=k, lloyd_rounds=2,
                        train_fraction=0.2)
    print(f"corpus={CORPUS} N={n} k={k} "
          f"init={time.monotonic() - t0:.1f}s")

    # arrival is driven in phases (one new file, one availableNow
    # run, same checkpoint) so each micro-batch genuinely probes the
    # index accumulated by all earlier ones — availableNow bundles
    # already-present files regardless of maxFilesPerTrigger.
    # Chunks are id-RANK ranges, not id-value ranges: the scale
    # corpora stride ids per tiled copy, and value-range chunking
    # silently yields empty files for most ranges (bench-only global
    # sort, fine at this row count).
    import glob

    from pyspark.sql import Window

    ranked = emb.withColumn(
        "_rnk", F.row_number().over(Window.orderBy("vec_id")) - 1)
    ranked.persist().count()
    os.makedirs(src)
    step = (n + N_BATCHES - 1) // N_BATCHES
    t_total = 0.0
    for b in range(N_BATCHES):
        tmp = os.path.join(WORK, "_tmp_chunk")
        (ranked.filter((F.col("_rnk") >= b * step)
                       & (F.col("_rnk") < (b + 1) * step))
         .drop("_rnk")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src, f"chunk_{b:03d}.parquet"))
        shutil.rmtree(tmp)

        stream = (spark.readStream
                  .schema("vec_id long, embedding array<double>")
                  .parquet(src))
        t0 = time.monotonic()
        q = stream_semantic_ingest(stream, index, out, checkpoint=cp,
                                   eps=EPS)
        q.awaitTermination()
        dt = time.monotonic() - t0
        t_total += dt
        print(f"  batch {b}: {dt:.1f}s ({step / dt:.0f} docs/s, "
              f"index={b * step} docs before this batch)")
    surv = spark.read.parquet(out).count()
    batches = (spark.read.parquet(index)
               .select("ingest_batch").distinct().count())
    print(f"streamed {n} docs in {t_total:.1f}s across {batches} "
          f"micro-batches: {n / t_total:.0f} docs/s end-to-end "
          f"(incl. per-phase stream startup), survivors={surv}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Streaming semantic-ingest throughput (BENCH_SCALING §19 add. 3/5):
docs/second through stream_semantic_ingest end to end — quantizer
assignment, batch-local SemDeDup, cell-pruned index probe, survivor
write, index append — under Structured Streaming's real foreachBatch
machinery (availableNow + one file per phase gives deterministic
micro-batch boundaries).

Two serving modes, selected by --no-handle (default IS the handle):

- handle (the serving configuration, r6 VERDICT #1): one
  open_semantic_index before the stream — quantizer read once,
  centroids persisted, assignment tables precomputed — carried
  through every foreachBatch call.
- per-call (the pre-r7 behavior): each micro-batch re-reads the
  quantizer and rebuilds the compact centroid tables (~0.5 s/batch
  of fixed work, measured to dominate at small batches).

Usage:
  python tools/bench_semantic_stream.py [corpus_dir] [work_dir] \
      [--batch-docs N] [--n-batches B] [--no-handle]
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
    append_semantic_batch,
    compact_semantic_index,
    init_semantic_index,
    open_semantic_index,
    semantic_dedup_batch_against_index,
    stream_semantic_ingest,
)

def _positional(argv: list[str]) -> list[str]:
    """Positional args with flag VALUES consumed too — a bare
    `--batch-docs 500` must not turn '500' into the corpus dir."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--batch-docs", "--n-batches"):
            skip = True
            continue
        if a.startswith("--"):
            continue
        out.append(a)
    return out


args = _positional(sys.argv[1:])
CORPUS = args[0] if len(args) > 0 else "/root/repo/.bench_scale/sf1"
WORK = args[1] if len(args) > 1 else "/tmp/sem_stream_bench"
USE_HANDLE = "--no-handle" not in sys.argv


def _flag(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


BATCH_DOCS = _flag("--batch-docs", 2000)
N_BATCHES = _flag("--n-batches", 10)
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
    print(f"corpus={CORPUS} N={n} k={k} batch_docs={BATCH_DOCS} "
          f"handle={USE_HANDLE} init={time.monotonic() - t0:.1f}s")

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
    step = BATCH_DOCS
    total_docs = min(n, step * N_BATCHES)
    seed_docs = n - total_docs

    t_open = time.monotonic()
    handle = open_semantic_index(spark, index) if USE_HANDLE else None
    open_s = time.monotonic() - t_open

    # pre-seed the index with everything the stream will NOT carry,
    # so each measured micro-batch probes a corpus-sized index (the
    # r6 study's setup: 2k-doc batches vs a ~200k-doc index); the
    # seed runs through the same kernel in 32k chunks, then one
    # compaction folds the seed batches into a negative generation.
    # SEED BATCH IDS MUST NOT COLLIDE WITH THE STREAM'S: compaction
    # relabels the ingest_batch PARTITION but deliberately preserves
    # the src_batch DATA column (the replay-exclusion key), so a seed
    # slab stamped src_batch=b would be silently invisible to stream
    # batch b's probe — duplicates admitted and pair work
    # undercounted, exactly in the measured batches. Offset by 1e6.
    t0 = time.monotonic()
    seed_h = handle if handle is not None \
        else open_semantic_index(spark, index)
    sb = 0
    for lo in range(0, seed_docs, 32768):
        chunk = (ranked.filter((F.col("_rnk") >= lo)
                               & (F.col("_rnk") < min(lo + 32768,
                                                      seed_docs)))
                 .drop("_rnk"))
        _, rows = semantic_dedup_batch_against_index(
            chunk, seed_h, 1_000_000 + sb, eps=EPS)
        append_semantic_batch(rows, index, 1_000_000 + sb)
        rows.unpersist()
        sb += 1
    folded = compact_semantic_index(spark, index)
    if handle is None:
        seed_h.close()
    print(f"seeded {seed_docs} docs in {sb} batches + compaction "
          f"({folded} dirs folded) in {time.monotonic() - t0:.1f}s")

    # ONE streaming query over all pre-written chunk files,
    # maxFilesPerTrigger=1: availableNow honors the per-trigger file
    # limit (verified on this Spark), so the batches run
    # SEQUENTIALLY through the same foreachBatch kernel, each
    # probing the index accumulated by all earlier ones — the
    # production serving shape. (The earlier bench restarted the
    # whole query per batch; its ~3-5 s of per-phase stream startup
    # was harness artifact, not serving cost.)
    for b in range(N_BATCHES):
        tmp = os.path.join(WORK, "_tmp_chunk")
        (ranked.filter((F.col("_rnk") >= seed_docs + b * step)
                       & (F.col("_rnk") < seed_docs + (b + 1) * step))
         .drop("_rnk")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src, f"chunk_{b:03d}.parquet"))
        shutil.rmtree(tmp)
    ranked.unpersist()

    stream = (spark.readStream
              .schema("vec_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    # --audit: record per-stage task counts for the WHOLE measured
    # serving run and report any byte-blind stage (heavy compute on
    # <= parallelism/8 tasks — tools/audit_tasks.py, r8 VERDICT #2).
    # The three historical failures in this exact loop were found by
    # hand-profiling; this makes the check part of the bench.
    import contextlib

    from tools.audit_tasks import measure
    audit_ctx = (measure(spark) if "--audit" in sys.argv
                 else contextlib.nullcontext())
    t0 = time.monotonic()
    with audit_ctx as rec:
        q = stream_semantic_ingest(stream, index, out, checkpoint=cp,
                                   eps=EPS, handle=handle)
        q.awaitTermination()
    t_total = time.monotonic() - t0
    if rec is not None:
        flags = rec.flagged()
        print(f"task audit: {len(rec.stages)} stages, "
              f"{len(flags)} byte-blind "
              f"(heavy per-task ms on <=par/8 tasks)")
        jvm = spark._jvm
        store = spark.sparkContext._jsc.sc().statusStore()
        seq = store.jobsList(jvm.java.util.ArrayList())
        jl = jvm.scala.jdk.javaapi.CollectionConverters.asJava(seq)
        stage2job = {}
        for i in range(jl.size()):
            j = jl.get(i)
            sids = jvm.scala.jdk.javaapi.CollectionConverters.asJava(
                j.stageIds())
            for si in range(sids.size()):
                stage2job[int(str(sids.get(si)))] = str(j.name())[:90]
        for s in (flags or rec.stages[:3]):
            print(f"  stage {s['stage_id']}: {s['tasks']} tasks, "
                  f"{s['per_task_ms']} ms/task | {s['name'][:60]} | "
                  f"job: {stage2job.get(s['stage_id'])}"
                  + ("  <-- FLAGGED" if s in flags else ""))
        if flags:
            print("task audit: FAIL — byte-blind stage(s) in the "
                  "serving loop")
    for p in q.recentProgress:
        rows = p["numInputRows"]
        dur = p["durationMs"]["triggerExecution"] / 1000.0
        if rows:
            print(f"  batch {p['batchId']}: {dur:.1f}s "
                  f"({rows / dur:.0f} docs/s, {rows} docs)")
    if handle is not None:
        handle.close()
    surv = spark.read.parquet(out).count()
    batches = (spark.read.parquet(index)
               .select("ingest_batch").distinct().count())
    print(f"streamed {total_docs} docs in {t_total:.1f}s across "
          f"{batches} micro-batches (one availableNow query): "
          f"{total_docs / t_total:.0f} docs/s end-to-end (incl. one "
          f"query startup; handle open {open_s:.1f}s not counted), "
          f"survivors={surv}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Root-cause the requantize source-dir variance (r8 VERDICT #4):
r7 measured 48-61 s requantizing the same 200k x 64-d corpus from
different source-dir states, vs r6's 32.6 s from a single
generation, with no pinned cause.

Method: build the SAME 200k-row index content in three source
layouts, then requantize each with per-phase wall times and stage
task counts:

  A. one compacted generation (r6's shape: 128 bucket dirs, 1 file
     each);
  B. seven live 32k-batch dirs (the serving shape before any fold:
     7 x 128 files);
  C. one generation + three live batch dirs (the mixed post-serving
     shape r7 measured against).

Index content is built DIRECTLY (quantize once, slice, append) —
kernel verdicts are irrelevant to this measurement. Phases are
decomposed with the statusStore job callsites: 'distinct+train'
(Lloyd jobs from functions/similarity), 'refile write' (the parquet
job at streaming/semantic.py), 'listing/snapshot' (wall minus job
time before the first train job), 'swap+delete' (after the refile).

Usage: python tools/bench_requantize_variance.py [corpus_dir] [work]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.session import get_spark  # noqa: E402
from radio_data_pipeline_spark.streaming.semantic import (  # noqa: E402
    append_semantic_batch,
    compact_semantic_index,
    init_semantic_index,
    read_semantic_quantizer,
    requantize_semantic_index,
)
from tools.audit_tasks import measure  # noqa: E402

CORPUS = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/repo/.bench_scale/sf10"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/reqvar"
TARGET = 256


def build_index(spark, emb, idx: str, k: int, n_batches: int,
                compact: bool) -> None:
    """Assign the whole corpus once against a freshly trained
    quantizer, slice by id rank into n_batches appends."""
    from radio_data_pipeline_spark.functions.similarity import (
        assign_to_centroids, l2_norm, _as_double)

    init_semantic_index(emb, idx, n_clusters=k, lloyd_rounds=2,
                        train_fraction=0.2)
    cents, meta = read_semantic_quantizer(spark, idx)
    a = assign_to_centroids(emb, cents, vec_col="embedding",
                            id_col="vec_id",
                            two_level=meta["two_level"],
                            coarse_clusters=meta["coarse_clusters"])
    rows = (emb.select(F.col("vec_id").alias("id"),
                       _as_double(F.col("embedding")).alias("v"))
            .join(a.withColumnRenamed("vec_id", "id"), "id")
            .select("id", "v", F.col("cluster").alias("cell"))
            .withColumn("vn", l2_norm(F.col("v")))
            .withColumn("cell_bucket",
                        F.pmod(F.col("cell"),
                               F.lit(meta["n_cell_buckets"]))
                        .cast("int"))
            .withColumn("_rnk",
                        F.row_number().over(Window.orderBy("id")) - 1))
    rows.persist()
    n = rows.count()
    step = math.ceil(n / n_batches)
    for b in range(n_batches):
        chunk = (rows.filter((F.col("_rnk") >= b * step)
                             & (F.col("_rnk") < (b + 1) * step))
                 .drop("_rnk"))
        append_semantic_batch(chunk, idx, b)
    rows.unpersist()
    if compact:
        compact_semantic_index(spark, idx)


def layout_stats(spark, idx: str) -> str:
    from radio_data_pipeline_spark.streaming.dedup import _ingest_dirs
    fs, _, dirs = _ingest_dirs(spark, idx)
    n_files, n_bytes = 0, 0
    for p in dirs:
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            n_files += 1
            n_bytes += st.getLen()
    return (f"{len(dirs)} dirs, {n_files} files, "
            f"{n_bytes / 1e6:.0f} MB")


def main() -> None:
    spark = get_spark("bench-reqvar", cpus=32)
    emb = (spark.read.parquet(os.path.join(CORPUS,
                                           "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n = emb.count()
    k = max(1, math.ceil(n / TARGET))
    print(f"corpus={CORPUS} N={n} initial k={k}")

    shutil.rmtree(WORK, ignore_errors=True)

    scenarios = {}
    # A: one compacted generation
    idx_a = f"{WORK}/idx_one_gen"
    build_index(spark, emb, idx_a, k, n_batches=7, compact=True)
    scenarios["A_one_generation"] = idx_a
    # B: seven live batch dirs
    idx_b = f"{WORK}/idx_live7"
    build_index(spark, emb, idx_b, k, n_batches=7, compact=False)
    scenarios["B_seven_live"] = idx_b
    # C: mixed — build 7, compact, then re-append 3 slabs of the SAME
    # generation rows as live dirs (ids AND src_batch preserved so
    # the distinct corpus stays exactly 200k — see the loop comment)
    idx_c = f"{WORK}/idx_mixed"
    build_index(spark, emb, idx_c, k, n_batches=7, compact=True)
    cents, meta = read_semantic_quantizer(spark, idx_c)
    gen = (spark.read.option("basePath", idx_c).parquet(idx_c)
           .filter(F.col("ingest_batch") < 0))
    n_gen = gen.count()
    quarter = n_gen // 4
    live = (gen.withColumn(
        "_rnk", F.row_number().over(Window.orderBy("id")) - 1))
    live.persist().count()
    for b in range(3):
        # SAME ids as the generation rows, re-appended: the
        # requantize distinct() is over (id, v, vn, src_batch), and
        # src_batch must also match or the re-appended slabs would
        # INFLATE C's distinct corpus by ~75% and confound the
        # layout comparison with a corpus-size effect (review r9 —
        # the first published run of scenario C had exactly this
        # bug; A-vs-B carried the conclusion, C is now honest too).
        chunk = (live.filter((F.col("_rnk") >= b * quarter)
                             & (F.col("_rnk") < (b + 1) * quarter))
                 .select("id", "v", "vn", "cell", "cell_bucket",
                         "src_batch"))
        (chunk.repartition(8, F.col("cell_bucket"))
         .write.mode("overwrite").partitionBy("cell_bucket")
         .parquet(f"{idx_c}/ingest_batch={10 + b}"))
    live.unpersist()
    scenarios["C_gen_plus_3_live"] = idx_c

    results = {}
    for name, idx in scenarios.items():
        print(f"--- {name}: {layout_stats(spark, idx)}")
        t0 = time.monotonic()
        with measure(spark) as rec:
            requantize_semantic_index(spark, idx, n_clusters=k * 2,
                                      lloyd_rounds=2,
                                      train_fraction=0.2)
        wall = time.monotonic() - t0
        job_ms = sum(s["run_ms"] for s in rec.stages)
        tiny = [s for s in rec.stages
                if s["tasks"] <= 2 and s["per_task_ms"] >= 1500]
        top = rec.stages[:5]
        results[name] = wall
        print(f"{name}: requantize {wall:.1f}s | {len(rec.stages)} "
              f"stages, sum-task-ms {job_ms} | "
              f"{len(tiny)} near-serial heavy stages")
        for s in top:
            print(f"    stage {s['stage_id']}: {s['tasks']} tasks, "
                  f"{s['per_task_ms']} ms/task, {s['run_ms']} total")
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Serving cost vs index size, measured (BENCH_SCALING §25c/§25d):
seed a semantic index to N rows FAST (direct assignment + bulk
appends + one fold — no kernel, the index layout is identical to a
served one), open a SemanticIndexHandle, then serve micro-batches
through the kernel at several batch sizes with the large-index probe
prune ON and OFF, and report per-batch walls.

This is the tool behind the prune threshold
(semantic._HANDLE_PRUNE_MIN_ROWS) and the k-policy sizing grid
(r10 VERDICT #1/#6): run it at 1M and 10M rows, with k ∝ N
(constant occupancy, the MaintenancePolicy default) and with k
capped, and compare.

Usage: python tools/bench_serving_scale.py corpus_dir work_dir
         [--seed-docs N] [--k K | --target OCC] [--batch-sizes CSV]
         [--reps R] [--prune both|on|off] [--eps F]
         [--soak N [--soak-docs D]]

--soak N (r12, VERDICT #2): after the grid, serve N additional
batches of --soak-docs (default 2000) through the SAME handle with
the prune forced ON, reporting per-third docs/s and the full wall
list — the long-horizon flatness evidence for the large-index
prune regime (BENCH_SCALING §26b).

Corpus: an embeddings.parquet with (vec_id, embedding) — e.g.
.bench_scale/emb1m or .bench_scale/emb10m (tools/make_embedding_corpus).
Serve docs come from the corpus TAIL (never seeded); seed ids are
offset so src_batch can never collide with a serve batch id.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.session import get_spark  # noqa: E402

_FLAGS = ("--seed-docs", "--k", "--target", "--batch-sizes", "--reps",
          "--prune", "--eps", "--soak", "--soak-docs")


def _flag(name: str, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def _positional(argv):
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in _FLAGS:
            skip = True
            continue
        if a.startswith("--"):
            continue
        out.append(a)
    return out


def main() -> None:
    from radio_data_pipeline_spark.functions.similarity import (
        _assign_points_inline,
        l2_norm,
        prepare_assignment,
    )
    from radio_data_pipeline_spark.streaming import semantic as sem

    args = _positional(sys.argv[1:])
    corpus = args[0] if args else "/root/repo/.bench_scale/emb1m"
    work = args[1] if len(args) > 1 else "/tmp/serving_scale_bench"
    seed_docs = _flag("--seed-docs", 0)
    k_flag = _flag("--k", 0)
    target = _flag("--target", 256)
    sizes = [int(x) for x in
             _flag("--batch-sizes", "20,2000,20000", str).split(",")]
    reps = _flag("--reps", 3)
    prune_mode = _flag("--prune", "both", str)
    eps = _flag("--eps", 0.8, float)
    soak = _flag("--soak", 0)
    soak_docs = _flag("--soak-docs", 2000)

    spark = get_spark("bench-serving-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(os.path.join(corpus,
                                           "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n = emb.count()
    max_batch = max(sizes)
    serve_need = (max_batch * reps * (2 if prune_mode == "both"
                                      else 1) * len(sizes)
                  + soak * soak_docs)
    if not seed_docs:
        seed_docs = n - min(n // 10, serve_need)
    k = k_flag or max(2, seed_docs // target)
    print(f"corpus={corpus} N={n} seed={seed_docs} k={k} "
          f"(occupancy ~{seed_docs // k})", flush=True)

    if os.path.exists(work):
        shutil.rmtree(work)
    index = os.path.join(work, "idx")
    os.makedirs(work)

    # ids are dense 0..N-1 in the make_embedding_corpus layout; a
    # vec_id threshold splits seed/serve without a window rank
    seed_df = emb.filter(F.col("vec_id") < seed_docs)
    t0 = time.monotonic()
    sem.init_semantic_index(
        seed_df, index, n_clusters=k, lloyd_rounds=2,
        train_fraction=min(1.0, 400_000 / max(1, seed_docs)))
    t_init = time.monotonic() - t0
    print(f"init (train k={k}): {t_init:.1f}s", flush=True)

    # bulk seed: one distributed assignment of all seed rows, bulk
    # appends with the guard explicitly skipped (no kernel probe ran),
    # one fold — layout-identical to a served index, hours faster
    t0 = time.monotonic()
    centroids, meta = sem.read_semantic_quantizer(spark, index)
    prepared = prepare_assignment(centroids, meta["two_level"],
                                  meta["coarse_clusters"])
    n_buckets = int(meta["n_cell_buckets"])
    pv = seed_df.select("vec_id",
                        F.col("embedding").cast("array<double>")
                        .alias("v"))
    if "coarse_pack" in prepared or "flat_pack" in prepared:
        a_rows = _assign_points_inline(pv, prepared, keep_v=True)
    else:
        # k*d above the inline-pack ceiling: join-shaped assignment
        from radio_data_pipeline_spark.functions.similarity import (
            assign_to_centroids)
        a = assign_to_centroids(seed_df, centroids,
                                two_level=meta["two_level"],
                                coarse_clusters=meta["coarse_clusters"],
                                prepared=prepared)
        a_rows = pv.join(a, "vec_id").select("vec_id", "v", "cluster")
    rows = (a_rows.select(F.col("vec_id").alias("id"), "v",
                          F.col("cluster").alias("cell"))
            .withColumn("vn", l2_norm(F.col("v")))
            .withColumn("cell_bucket",
                        F.pmod(F.col("cell"),
                               F.lit(n_buckets)).cast("int")))
    # persist the assignment across the chunked appends (r12): each
    # chunk's append filters this LAZY frame, so without the persist
    # every chunk re-executed the full N-row assignment — at 10M rows
    # / k=39k that was ~35 min PER CHUNK (the reason the r11 §26b
    # seed never finished). One materialization, five cached reads.
    rows = rows.persist()
    # chunk the bulk append so no single overwrite dir is huge
    chunk_rows = 2_000_000
    n_chunks = max(1, math.ceil(seed_docs / chunk_rows))
    for i in range(n_chunks):
        lo = i * chunk_rows
        hi = min(seed_docs, lo + chunk_rows)
        sem.append_semantic_batch(
            rows.filter((F.col("id") >= lo) & (F.col("id") < hi)),
            index, 1_000_000 + i,
            quantizer_guard=sem.SKIP_QUANTIZER_GUARD)
        print(f"  seeded chunk {i + 1}/{n_chunks} "
              f"({hi - lo} rows)", flush=True)
    sem.compact_semantic_index(spark, index)
    rows.unpersist()
    from radio_data_pipeline_spark.functions.similarity import (
        release_assignment)
    release_assignment(prepared)
    t_seed = time.monotonic() - t0
    print(f"bulk seed + fold: {t_seed:.1f}s", flush=True)

    # serve from the tail
    serve_base = seed_docs
    modes = {"both": (False, True), "on": (True,),
             "off": (False,)}[prune_mode]
    out = {"corpus": corpus, "n_index": seed_docs, "k": k,
           "occupancy": seed_docs // k, "eps": eps,
           "init_s": round(t_init, 1), "seed_s": round(t_seed, 1),
           "loadavg": list(os.getloadavg()), "grid": []}

    t0 = time.monotonic()
    handle = sem.open_semantic_index(spark, index)
    print(f"handle open (gen cache {handle._gen_count} rows): "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    offset = serve_base
    bid = 0
    for size in sizes:
        for prune in modes:
            sem._HANDLE_PRUNE_MIN_ROWS = 0 if prune else (1 << 62)
            walls = []
            for r in range(reps):
                chunk = (emb.filter(
                    (F.col("vec_id") >= offset)
                    & (F.col("vec_id") < offset + size))
                    .select("vec_id", "embedding"))
                chunk.persist().count()
                t0 = time.monotonic()
                survivors, rows_b = \
                    sem.semantic_dedup_batch_against_index(
                        chunk, handle, bid, eps=eps)
                n_surv = survivors.count()
                sem.append_semantic_batch(rows_b, index, bid)
                walls.append(time.monotonic() - t0)
                rows_b.unpersist()
                chunk.unpersist()
                offset += size
                bid += 1
            row = {"batch_docs": size, "prune": bool(prune),
                   "walls_s": [round(w, 2) for w in walls],
                   "min_s": round(min(walls), 2),
                   "median_s": round(sorted(walls)[len(walls) // 2],
                                     2),
                   "docs_per_s": round(
                       size / sorted(walls)[len(walls) // 2], 1),
                   "survivors_last": n_surv}
            out["grid"].append(row)
            print(json.dumps(row), flush=True)
    if soak:
        # long-horizon flatness: N more batches, prune forced ON,
        # same handle, index growing by soak_docs per batch — the
        # per-batch fixed cost must stay flat (sub-linear in N)
        sem._HANDLE_PRUNE_MIN_ROWS = 0
        walls = []
        for r in range(soak):
            chunk = (emb.filter(
                (F.col("vec_id") >= offset)
                & (F.col("vec_id") < offset + soak_docs))
                .select("vec_id", "embedding"))
            chunk.persist().count()
            t0 = time.monotonic()
            survivors, rows_b = \
                sem.semantic_dedup_batch_against_index(
                    chunk, handle, bid, eps=eps)
            survivors.count()
            sem.append_semantic_batch(rows_b, index, bid)
            walls.append(time.monotonic() - t0)
            rows_b.unpersist()
            chunk.unpersist()
            offset += soak_docs
            bid += 1
            if (r + 1) % 20 == 0:
                print(f"  soak {r + 1}/{soak}: last20 median "
                      f"{sorted(walls[-20:])[10]:.2f}s", flush=True)
        third = max(1, soak // 3)
        thirds = [walls[:third], walls[third:2 * third],
                  walls[2 * third:]]
        out["soak"] = {
            "batches": soak, "batch_docs": soak_docs,
            "walls_s": [round(w, 2) for w in walls],
            "median_s": round(sorted(walls)[len(walls) // 2], 2),
            "thirds_median_s": [round(sorted(t)[len(t) // 2], 2)
                                for t in thirds],
            "thirds_docs_per_s": [round(soak_docs * len(t)
                                        / max(sum(t), 1e-9), 1)
                                  for t in thirds],
        }
        print("SOAK " + json.dumps(out["soak"]["thirds_median_s"])
              + " med thirds", flush=True)
    handle.close()
    out["loadavg_end"] = list(os.getloadavg())
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

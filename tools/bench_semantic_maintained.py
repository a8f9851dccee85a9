#!/usr/bin/env python
"""The full semantic serve+maintain deployment loop, measured: an
open SemanticIndexHandle serves micro-batches through the kernel
while ``maintain_semantic_index`` runs between batches — compaction
fires at the policy cadence, and when accumulated growth trips the
OCCUPANCY trigger the policy requantizes, at which point the held
handle must fail loudly (StaleQuantizerError — the r8 VERDICT #1
guard) and be reopened. This is the one bench that exercises every
round-9 serving/maintenance piece in one run: handle generation
cache, policy decision table, lease-guarded compaction, policy-driven
requantize, staleness guard, reopen cost.

Setup mirrors bench_semantic_stream: seed the index with part of the
corpus (ids offset by 1e6 so seed src_batch can never collide with a
serve batch id), then serve the remainder in fixed-size batches. The
quantizer is deliberately initialized at the SEED's auto-scale k, so
serving growth pushes mean occupancy past the policy bar mid-run —
the honest trajectory a deployment sees between retrains.

Usage: python tools/bench_semantic_maintained.py [corpus_dir]
       [work_dir] [--batch-docs N] [--n-batches B] [--maintain M]
       [--over-occupancy F]
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
    MaintenancePolicy,
    StaleQuantizerError,
    append_semantic_batch,
    compact_semantic_index,
    init_semantic_index,
    maintain_semantic_index,
    open_semantic_index,
    semantic_dedup_batch_against_index,
)

_FLAGS = ("--batch-docs", "--n-batches", "--maintain",
          "--over-occupancy", "--race-at")


def _flag(name: str, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def _positional(argv: list[str]) -> list[str]:
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


args = _positional(sys.argv[1:])
CORPUS = args[0] if args else "/root/repo/.bench_scale/sf10"
WORK = args[1] if len(args) > 1 else "/tmp/sem_maintained_bench"
BATCH_DOCS = _flag("--batch-docs", 2000)
N_BATCHES = _flag("--n-batches", 50)
MAINTAIN = _flag("--maintain", 8)
OVER_OCC = _flag("--over-occupancy", 1.5, float)
# --race-at B1,B2: at these serve batches, inject a REQUANTIZE between
# the kernel's assignment and the batch's index append — the exact
# race the append-time quantizer guard exists for. The soak asserts
# the guard fires (RuntimeError), the batch REPLAYS cleanly against
# the new quantizer through a fresh handle, the replay equals an
# independent uncontended recompute exactly (id-set equality), and a
# dead-cell integrity sweep passes (every indexed cell exists in the
# new quantizer) — r9 VERDICT #6: guard + replay must compose
# REPEATEDLY under load, interleaved with policy-driven maintenance.
RACE_AT = [int(x) for x in
           _flag("--race-at", "", str).split(",") if x]
EPS = 0.8
TARGET = 256


def _race_batch(spark, index: str, chunk, b: int):
    """Inject the assignment-vs-requantize race at serve batch ``b``
    and prove the guard + replay composition (see RACE_AT). Returns
    (replay_wall_seconds, fresh_handle) with the batch committed."""
    from radio_data_pipeline_spark.streaming.semantic import (
        read_semantic_quantizer,
        requantize_semantic_index,
    )

    # 1. assign with the CURRENT quantizer (path mode so the kernel
    #    snapshots the pre-race quantizer for the append-time guard)
    _, rows = semantic_dedup_batch_against_index(chunk, index, b,
                                                 eps=EPS)
    rows.count()  # force assignment before the swap

    # 2. a requantize lands between assignment and append
    n_idx = spark.read.parquet(index).count()
    k_new = max(2, n_idx // TARGET)
    t0 = time.monotonic()
    requantize_semantic_index(spark, index, n_clusters=k_new,
                              lloyd_rounds=2, train_fraction=0.2)
    print(f"  batch {b}: RACE requantize (k={k_new}) injected "
          f"between assignment and append "
          f"({time.monotonic() - t0:.1f}s)")

    # 3. the append-time guard MUST fail the stale batch loudly
    try:
        append_semantic_batch(rows, index, b)
        raise AssertionError(
            f"batch {b}: append-time quantizer guard did NOT fire")
    except RuntimeError as e:
        if "quantizer" not in str(e):
            raise
        print(f"  batch {b}: append-time guard fired as required")
    rows.unpersist()

    # 4. replay against the NEW quantizer through a fresh handle —
    #    the streaming contract's self-healing path
    t0 = time.monotonic()
    h = open_semantic_index(spark, index)
    surv_r, rows_r = semantic_dedup_batch_against_index(chunk, h, b,
                                                        eps=EPS)
    replay_ids = sorted(r["vec_id"] for r in
                        surv_r.select("vec_id").collect())
    (surv_r.write.mode("overwrite")
     .parquet(f"{WORK}/out/batch={b}"))
    append_semantic_batch(rows_r, index, b)
    wall = time.monotonic() - t0
    rows_r.unpersist()

    # 5. the replay equals an UNCONTENDED recompute exactly: a batch
    #    that never saw the race produces the identical survivor set
    surv_c, rows_c = semantic_dedup_batch_against_index(chunk, h, b,
                                                        eps=EPS)
    control_ids = sorted(r["vec_id"] for r in
                         surv_c.select("vec_id").collect())
    rows_c.unpersist()
    assert replay_ids == control_ids, (
        f"batch {b}: replayed survivors diverge from the uncontended "
        f"recompute ({len(replay_ids)} vs {len(control_ids)})")

    # 6. dead-cell integrity: every cell in the index must exist in
    #    the new quantizer — a mis-filed row would be invisible to
    #    every future probe
    cents, _ = read_semantic_quantizer(spark, index)
    live_cells = {r["cell"] for r in spark.read.parquet(index)
                  .select("cell").distinct().collect()}
    quant_cells = {r["cluster"] for r in
                   cents.select("cluster").distinct().collect()}
    dead = live_cells - quant_cells
    assert not dead, (
        f"batch {b}: {len(dead)} dead cells in index after replay")
    print(f"  batch {b}: replay == uncontended recompute "
          f"({len(replay_ids)} survivors); integrity sweep clean "
          f"({len(live_cells)} live cells within k={len(quant_cells)})")
    return wall, h


def main() -> None:
    spark = get_spark("bench-semantic-maintained")
    emb = (spark.read.parquet(os.path.join(CORPUS,
                                           "embeddings.parquet"))
           .select("vec_id", "embedding"))
    n = emb.count()
    serve_docs = min(n // 2, BATCH_DOCS * N_BATCHES)
    seed_docs = n - serve_docs
    k = max(1, math.ceil(seed_docs / TARGET))

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    index = os.path.join(WORK, "idx")

    ranked = emb.withColumn(
        "_rnk", F.row_number().over(Window.orderBy("vec_id")) - 1)
    ranked.persist().count()

    t0 = time.monotonic()
    init_semantic_index(ranked.filter(F.col("_rnk") < seed_docs)
                        .drop("_rnk"),
                        index, n_clusters=k, lloyd_rounds=2,
                        train_fraction=0.2)
    print(f"corpus={CORPUS} N={n} seed={seed_docs} k={k} "
          f"serve={serve_docs} batch={BATCH_DOCS} "
          f"init={time.monotonic() - t0:.1f}s")

    # seed through the kernel (ids offset 1e6 — the src_batch
    # collision rule), one fold at the end
    t0 = time.monotonic()
    h = open_semantic_index(spark, index)
    sb = 0
    for lo in range(0, seed_docs, 32768):
        chunk = (ranked.filter((F.col("_rnk") >= lo)
                               & (F.col("_rnk") < min(lo + 32768,
                                                      seed_docs)))
                 .drop("_rnk"))
        _, rows = semantic_dedup_batch_against_index(
            chunk, h, 1_000_000 + sb, eps=EPS)
        append_semantic_batch(rows, index, 1_000_000 + sb)
        rows.unpersist()
        sb += 1
    folded = compact_semantic_index(spark, index)
    print(f"seeded {seed_docs} docs in {sb} batches + fold "
          f"({folded} dirs) in {time.monotonic() - t0:.1f}s")

    pol = MaintenancePolicy(compact_after_batches=MAINTAIN,
                            requantize_over_occupancy=OVER_OCC,
                            target_cluster_rows=TARGET,
                            min_rows_for_requantize=10_000,
                            lloyd_rounds=2, train_fraction=0.2)

    walls, maints, reopens, noops = [], [], [], []
    n_b = min(N_BATCHES, serve_docs // BATCH_DOCS)
    # --audit: per-stage task counts for the whole serve+maintain
    # loop (byte-blindness check, tools/audit_tasks.py)
    import contextlib

    from tools.audit_tasks import measure
    audit_ctx = (measure(spark) if "--audit" in sys.argv
                 else contextlib.nullcontext())
    with audit_ctx as rec:
        try:
            for b in range(n_b):
                lo = seed_docs + b * BATCH_DOCS
                chunk = (ranked.filter((F.col("_rnk") >= lo)
                                       & (F.col("_rnk") < lo + BATCH_DOCS))
                         .drop("_rnk"))
                chunk.persist().count()
                if b in RACE_AT:
                    h.close()
                    wall, h = _race_batch(spark, index, chunk, b)
                    walls.append(wall)
                    chunk.unpersist()
                else:
                    t0 = time.monotonic()
                    survivors, rows = \
                        semantic_dedup_batch_against_index(
                            chunk, h, b, eps=EPS)
                    (survivors.write.mode("overwrite")
                     .parquet(f"{WORK}/out/batch={b}"))
                    append_semantic_batch(rows, index, b)
                    walls.append(time.monotonic() - t0)
                    rows.unpersist()
                    chunk.unpersist()

                t0 = time.monotonic()
                rep = maintain_semantic_index(spark, index, pol)
                dt = time.monotonic() - t0
                if rep["action"] == "noop":
                    # unlike the band loop, the semantic signals NEED a
                    # rows count per call (the occupancy trigger) — this
                    # records what that costs the serving cadence
                    noops.append(dt)
                if rep["action"] != "noop":
                    s = rep["signals"]
                    maints.append((b, rep["action"], dt))
                    print(f"  batch {b}: {rep['action']} in {dt:.1f}s "
                          f"(lives={s['live_batches']} rows={s['rows']} "
                          f"k={s['k']} occ={s['occupancy']:.0f})")
                if rep["action"] == "requantize":
                    # the held handle MUST now refuse to serve — the
                    # staleness guard is the whole point of the exercise
                    try:
                        h.check_fresh()
                        raise AssertionError(
                            "stale handle not detected after requantize")
                    except StaleQuantizerError:
                        pass
                    h.close()
                    t0 = time.monotonic()
                    h = open_semantic_index(spark, index)
                    reopen_s = time.monotonic() - t0
                    reopens.append(reopen_s)
                    print(f"  batch {b}: StaleQuantizerError raised as "
                          f"required; reopened handle in {reopen_s:.1f}s")
        finally:
            h.close()
    ranked.unpersist()

    third = max(1, n_b // 3)
    segs = [walls[i:i + third] for i in range(0, n_b, third)]
    print("maintained semantic serving: " + " | ".join(
        f"batches {i*third}-{i*third+len(s)-1}: "
        f"{sum(s)/len(s):.2f}s/batch "
        f"({BATCH_DOCS/(sum(s)/len(s)):.0f} docs/s)"
        for i, s in enumerate(segs) if s))
    if maints:
        tot = sum(dt for _, _, dt in maints)
        acts = {}
        for _, a, _ in maints:
            acts[a] = acts.get(a, 0) + 1
        print(f"maintenance: {acts}, {tot:.1f}s total "
              f"({tot/n_b:.2f}s amortized per batch); "
              f"handle reopens: {len(reopens)} "
              f"({sum(reopens):.1f}s total)")
    if noops:
        print(f"noop maintenance overhead: "
              f"{sum(noops)/len(noops)*1000:.0f}ms/call "
              f"(signals include the occupancy rows count)")
    if rec is not None:
        flags = rec.flagged()
        print(f"task audit: {len(rec.stages)} stages, "
              f"{len(flags)} byte-blind")
        for s in flags[:10]:
            print(f"  FLAGGED: stage {s['stage_id']} {s['name']} "
                  f"tasks={s['tasks']} per_task_ms={s['per_task_ms']}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Band-index serving parity, measured first (r8 VERDICT #7): does
``dedup_batch_against_index`` (streaming/dedup.py) pay enough
per-batch FIXED cost — index re-listing at DataFrame creation, the
probe-prefix collect, the two commits — to justify porting the
semantic tier's open-handle pattern?

Unlike the semantic kernel there is no quantizer to cache: the only
handle-shaped candidates are (a) the per-call ``spark.read.parquet``
partition discovery over the whole index tree (grows with dir
count), and (b) the sequential survivor/band writes (the semantic
tier's parallel-commit win). This bench measures each phase per
batch while the index grows, then after compaction, and prints a
verdict line.

Usage: python tools/bench_band_serving.py [corpus_dir] [work_dir]
       [--batch-docs N] [--n-batches B] [--maintain M]

``--maintain M``: instead of the phase study, run every batch through
an open handle with ``maintain_band_index`` called between batches
(BandMaintenancePolicy(compact_after_batches=M)) — the full serving
loop a deployment runs. Reports per-batch wall in thirds (flat ==
maintenance is holding the §22 growth down), each compaction's cost,
and the signal trace, so the policy cadence is measured rather than
assumed.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from radio_data_pipeline_spark.session import get_spark  # noqa: E402
from radio_data_pipeline_spark.streaming.dedup import (  # noqa: E402
    append_batch_bands,
    compact_band_index,
    dedup_batch_against_index,
    open_band_index,
)


def _flag(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def _positional(argv: list[str]) -> list[str]:
    # flag VALUES consumed too — `--batch-docs 500` must not turn
    # '500' into the corpus dir (same parsing as the semantic bench)
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--batch-docs", "--n-batches", "--maintain"):
            skip = True
            continue
        if a.startswith("--"):
            continue
        out.append(a)
    return out


args = _positional(sys.argv[1:])
CORPUS = args[0] if args else "/root/repo/.bench_scale/sf1"
WORK = args[1] if len(args) > 1 else "/tmp/band_serving_bench"
BATCH_DOCS = _flag("--batch-docs", 2000)
N_BATCHES = _flag("--n-batches", 24)
MAINTAIN = _flag("--maintain", 0)


def main() -> None:
    spark = get_spark("bench-band-serving", cpus=32)
    docs = (spark.read.parquet(os.path.join(CORPUS,
                                            "documents.parquet"))
            .select("doc_id", "text"))
    ranked = docs.withColumn(
        "_rnk", F.row_number().over(Window.orderBy("doc_id")) - 1)
    ranked.persist()
    n = ranked.count()
    print(f"corpus={CORPUS} docs={n} batch={BATCH_DOCS} "
          f"batches={N_BATCHES}")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    index = f"{WORK}/idx"

    def run_batches(tag: str, ids, handle=None) -> None:
        # phase-instrumented copy of the stream wrapper's body: the
        # kernel builds lazily, so the LIST phase is isolated by
        # timing the same spark.read.parquet(index) discovery the
        # kernel performs, and PROBE-COLLECT rides inside kernel
        # build (its one eager action)
        sums = {"list": 0.0, "kernel": 0.0, "surv": 0.0,
                "bands": 0.0, "total": 0.0}
        m = 0
        for b in ids:
            lo = b * BATCH_DOCS
            chunk = (ranked.filter((F.col("_rnk") >= lo)
                                   & (F.col("_rnk") < lo + BATCH_DOCS))
                     .drop("_rnk"))
            chunk.persist().count()
            t0 = time.monotonic()
            if handle is None and os.path.exists(index):
                spark.read.parquet(index)  # discovery-only probe
            t1 = time.monotonic()
            survivors, bands = dedup_batch_against_index(
                chunk, handle if handle is not None else index, b)
            t2 = time.monotonic()
            (survivors.write.mode("overwrite")
             .parquet(f"{WORK}/out/batch={b}"))
            t3 = time.monotonic()
            append_batch_bands(bands, index, b)
            t4 = time.monotonic()
            bands.unpersist()
            chunk.unpersist()
            sums["list"] += t1 - t0
            sums["kernel"] += t2 - t1
            sums["surv"] += t3 - t2
            sums["bands"] += t4 - t3
            sums["total"] += t4 - t0
            m += 1
        per = {k: v / m for k, v in sums.items()}
        rate = BATCH_DOCS / per["total"]
        print(f"{tag}: per-batch total {per['total']:.2f}s "
              f"({rate:.0f} docs/s) | list {per['list']*1000:.0f}ms "
              f"kernel(build+collect) {per['kernel']*1000:.0f}ms "
              f"surv-write {per['surv']*1000:.0f}ms "
              f"bands-append {per['bands']*1000:.0f}ms")

    if MAINTAIN:
        run_maintained(spark, ranked, index)
        ranked.unpersist()
        return

    quarter = N_BATCHES // 4
    run_batches("fresh (plain)", range(quarter))
    run_batches("grown (plain)", range(quarter, 2 * quarter))
    t0 = time.monotonic()
    folded = compact_band_index(spark, index)
    print(f"compaction folded {folded} dirs in "
          f"{time.monotonic() - t0:.1f}s")
    run_batches("post-compaction (plain)",
                range(2 * quarter, 3 * quarter))
    h = open_band_index(spark, index)
    try:
        run_batches("grown-again (handle)",
                    range(3 * quarter, N_BATCHES), handle=h)
    finally:
        h.close()
    ranked.unpersist()


def run_maintained(spark, ranked, index: str) -> None:
    """The full policy-maintained serving loop: handle-served kernel,
    maintain_band_index between batches. Batch wall is reported
    WITHOUT maintenance time (that's the steady-state serving cost a
    deployment sees when maintenance runs off the hot path) and each
    firing's cost and signals are printed separately.

    ``--audit``: record per-stage task counts for the whole loop —
    serving kernel, cache rebuilds after each fold, the folds
    themselves — and report any byte-blind stage (heavy compute on
    <= parallelism/8 tasks; tools/audit_tasks.py)."""
    import contextlib

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, maintain_band_index)
    from tools.audit_tasks import measure

    pol = BandMaintenancePolicy(compact_after_batches=MAINTAIN)
    walls, fires, noops = [], [], []
    handle = None
    audit_ctx = (measure(spark) if "--audit" in sys.argv
                 else contextlib.nullcontext())
    with audit_ctx as rec:
        try:
            for b in range(N_BATCHES):
                lo = b * BATCH_DOCS
                chunk = (ranked.filter((F.col("_rnk") >= lo)
                                       & (F.col("_rnk") < lo + BATCH_DOCS))
                         .drop("_rnk"))
                chunk.persist().count()
                t0 = time.monotonic()
                survivors, bands = dedup_batch_against_index(
                    chunk, handle if handle is not None else index, b)
                (survivors.write.mode("overwrite")
                 .parquet(f"{WORK}/out/batch={b}"))
                append_batch_bands(bands, index, b)
                walls.append(time.monotonic() - t0)
                bands.unpersist()
                chunk.unpersist()
                if handle is None:  # _meta.json exists after batch 0
                    handle = open_band_index(spark, index)
                t0 = time.monotonic()
                rep = maintain_band_index(spark, index, pol)
                dt = time.monotonic() - t0
                if rep["action"] != "noop":
                    s = rep["signals"]
                    fires.append((b, dt))
                    print(f"  batch {b}: {rep['action']} folded "
                          f"{rep['result']} dirs in {dt:.1f}s "
                          f"(lives={s['live_batches']} "
                          f"gens={s['generations']} files={s['files']})")
                else:
                    noops.append(dt)
        finally:
            if handle is not None:
                handle.close()
    third = max(1, N_BATCHES // 3)
    segs = [walls[i:i + third] for i in range(0, N_BATCHES, third)]
    per = [sum(s) / len(s) for s in segs if s]
    print(f"maintained serving (policy compact_after={MAINTAIN}): "
          + " | ".join(
              f"batches {i*third}-{i*third+len(s)-1}: "
              f"{p:.2f}s/batch ({BATCH_DOCS/p:.0f} docs/s)"
              for i, (s, p) in enumerate(zip(segs, per))))
    if fires:
        tot = sum(dt for _, dt in fires)
        print(f"maintenance: {len(fires)} compactions, "
              f"{tot:.1f}s total ({tot/N_BATCHES:.2f}s amortized "
              f"per batch)")
    if noops:
        print(f"noop maintenance overhead: "
              f"{sum(noops)/len(noops)*1000:.0f}ms/call "
              f"(signals are driver-side listings, no job)")
    if rec is not None:
        flags = rec.flagged()
        print(f"task audit: {len(rec.stages)} stages, "
              f"{len(flags)} byte-blind")
        for s in flags[:10]:
            print(f"  FLAGGED: stage {s['stage_id']} {s['name']} "
                  f"tasks={s['tasks']} per_task_ms={s['per_task_ms']}")


if __name__ == "__main__":
    main()

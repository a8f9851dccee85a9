#!/usr/bin/env python
"""The composed multi-signal serve+maintain loop, measured: per
micro-batch, the band-LSH gate runs over the full batch and only its
survivors pay the semantic signal (streaming/multi_signal.py — the
live form of the dedup_multi_signal batch query). Both persistent
indexes grow under their own maintenance policies; commits run
concurrently exactly as stream_multi_signal_ingest orders them.

The headline number this bench exists for: the marginal cost of the
semantic tier in the composition vs paying it for EVERY doc.
``--semantic-all`` runs the same loop with the band tier's verdict
ignored for semantic admission (full batch assigned + probed), so the
two modes bracket what the tiered design saves at a given dup rate.

Corpus: SYNTHETIC with controlled per-tier duplication — the
testdata documents table is template-generated and the band gate
drops ~100% of it against a seeded index (measured; every serve doc
collides with a seed near-twin), which makes the tiered-vs-flat
comparison vacuous. Here the seed half is fully unique; the serve
half mixes --band-dup-pct exact text copies of seed docs,
--sem-dup-pct textually-new docs whose embeddings sit within eps of
a seed doc, and unique docs for the rest. Text and embeddings are
pure deterministic functions of doc_id (sin-mixed 64-d vectors), so
the dup classes need no joins and no files. Seed phase chunks the
first half through the kernel with 1e6-offset batch ids (src_batch
collision rule), folds both indexes, then serves at --batch-docs.

Usage: python tools/bench_multi_signal_stream.py [n_docs] [work_dir]
       [--batch-docs N] [--n-batches B] [--maintain M]
       [--band-dup-pct P] [--sem-dup-pct P] [--semantic-all]
       [--audit]
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
from radio_data_pipeline_spark.streaming.dedup import (  # noqa: E402
    BandMaintenancePolicy,
    append_batch_bands,
    compact_band_index,
    maintain_band_index,
    open_band_index,
)
from radio_data_pipeline_spark.streaming.multi_signal import (  # noqa: E402
    multi_signal_batch_against_indexes,
)
from radio_data_pipeline_spark.streaming.semantic import (  # noqa: E402
    MaintenancePolicy,
    append_semantic_batch,
    compact_semantic_index,
    init_semantic_index,
    maintain_semantic_index,
    open_semantic_index,
    semantic_dedup_batch_against_index,
)

_FLAGS = ("--batch-docs", "--n-batches", "--maintain",
          "--band-dup-pct", "--sem-dup-pct", "--band-over-files",
          "--over-occupancy", "--requantize-min-rows",
          "--race-sem-at", "--race-band-at")


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
N_DOCS = int(args[0]) if args else 200_000
WORK = args[1] if len(args) > 1 else "/tmp/multi_signal_bench"
BATCH_DOCS = _flag("--batch-docs", 2000)
N_BATCHES = _flag("--n-batches", 24)
MAINTAIN = _flag("--maintain", 8)
BAND_DUP_PCT = _flag("--band-dup-pct", 30)
SEM_DUP_PCT = _flag("--sem-dup-pct", 20)
SEMANTIC_ALL = "--semantic-all" in sys.argv
# soak knobs (r10 VERDICT #3): --over-occupancy below the default 10
# lets the policy requantize fire mid-run; --race-sem-at/--race-band-at
# inject the two tier races (see _race_sem_batch/_race_band_batch)
OVER_OCC = _flag("--over-occupancy", 10.0, float)
REQ_MIN_ROWS = _flag("--requantize-min-rows", 10**9)
RACE_SEM_AT = [int(x) for x in
               _flag("--race-sem-at", "", str).split(",") if x]
RACE_BAND_AT = [int(x) for x in
                _flag("--race-band-at", "", str).split(",") if x]
EPS = 0.8
TARGET = 256
DIM = 64


def _surv_ids(df) -> list:
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _race_sem_batch(spark, chunk, b, band_index, sem_index, bh, sh):
    """Inject a semantic REQUANTIZE between the composed kernel's
    assignment and the batch's index appends — the §25a race, now
    inside the TIERED gate. Asserts: the append-time quantizer guard
    fires; the held semantic handle is stale; the whole-batch replay
    through a fresh handle equals an independent uncontended
    recompute id-for-id; the dead-cell sweep is clean. Returns
    (replay_wall, fresh_semantic_handle) with the batch committed."""
    from radio_data_pipeline_spark.streaming.semantic import (
        StaleQuantizerError,
        read_semantic_quantizer,
        requantize_semantic_index,
    )

    _, bands, rows, band_surv = multi_signal_batch_against_indexes(
        chunk, bh, sh, b, eps=EPS)
    rows.count()  # force assignment before the swap

    n_idx = spark.read.parquet(sem_index).count()
    k_new = max(2, n_idx // TARGET)
    t0 = time.monotonic()
    requantize_semantic_index(spark, sem_index, n_clusters=k_new,
                              lloyd_rounds=2, train_fraction=0.2)
    print(f"  batch {b}: RACE sem requantize (k={k_new}) injected "
          f"({time.monotonic() - t0:.1f}s)")

    # band commit is unaffected by the semantic swap — it lands
    append_batch_bands(bands, band_index, b)
    # ...but the stale semantic append MUST fail loudly
    try:
        append_semantic_batch(rows, sem_index, b)
        raise AssertionError(
            f"batch {b}: append-time quantizer guard did NOT fire")
    except RuntimeError as e:
        if "quantizer" not in str(e):
            raise
        print(f"  batch {b}: append-time guard fired as required")
    # ...and the HELD handle must refuse to serve another batch
    try:
        sh.check_fresh()
        raise AssertionError(
            f"batch {b}: held semantic handle not stale post-swap")
    except StaleQuantizerError:
        pass
    bands.unpersist()
    rows.unpersist()
    band_surv.unpersist()

    # whole-batch replay through a fresh handle (streaming contract:
    # all three commits re-run; overwrites are idempotent)
    sh.close()
    t0 = time.monotonic()
    sh = open_semantic_index(spark, sem_index)
    surv_r, bands_r, rows_r, bsurv_r = \
        multi_signal_batch_against_indexes(chunk, bh, sh, b, eps=EPS)
    ids_r = _surv_ids(surv_r)
    (surv_r.write.mode("overwrite").parquet(f"{WORK}/out/batch={b}"))
    append_batch_bands(bands_r, band_index, b)
    append_semantic_batch(rows_r, sem_index, b)
    wall = time.monotonic() - t0
    bands_r.unpersist()
    rows_r.unpersist()
    bsurv_r.unpersist()

    # uncontended control: a batch that never saw the race
    surv_c, bands_c, rows_c, bsurv_c = \
        multi_signal_batch_against_indexes(chunk, bh, sh, b, eps=EPS)
    ids_c = _surv_ids(surv_c)
    for f in (bands_c, rows_c, bsurv_c):
        f.unpersist()
    assert ids_r == ids_c, (
        f"batch {b}: replayed survivors diverge from uncontended "
        f"recompute ({len(ids_r)} vs {len(ids_c)})")

    # dead-cell integrity: every indexed cell exists in the new
    # quantizer (a mis-filed row is invisible to every future probe)
    cents, _ = read_semantic_quantizer(spark, sem_index)
    live = {r["cell"] for r in spark.read.parquet(sem_index)
            .select("cell").distinct().collect()}
    quant = {r["cluster"] for r in
             cents.select("cluster").distinct().collect()}
    assert not (live - quant), (
        f"batch {b}: {len(live - quant)} dead cells after replay")
    print(f"  batch {b}: sem-race replay == uncontended recompute "
          f"({len(ids_r)} survivors); dead-cell sweep clean")
    return wall, sh


def _race_band_batch(spark, chunk, b, band_index, sem_index, bh, sh):
    """Inject a band-index FOLD between the composed kernel and the
    batch's commits — the serving-vs-external-maintainer race whose
    documented contract is TRANSIENT FAILURE + SAME-ID REPLAY
    (tests/test_streaming_semantic.py
    test_concurrent_external_compaction_never_corrupts): the fold
    deletes the live dirs the in-flight lazy plans reference, so the
    first attempt's actions may fail with a file-not-found class
    (and partially-landed commits are fine — replay overwrites all
    three). Asserts: the replay through the same handles (their gen
    caches refresh by dir listing) commits cleanly; a SECOND fold
    then relabels this batch's own rows into a generation and an
    uncontended recompute still equals the replay id-for-id — the
    own-batch src_batch exclusion survives the relabel in BOTH tiers
    of the composition. Returns the batch wall."""
    t0 = time.monotonic()
    surv, bands, rows, band_surv = multi_signal_batch_against_indexes(
        chunk, bh, sh, b, eps=EPS)
    bands.count()  # force the band table before the fold
    folded = compact_band_index(spark, band_index)
    print(f"  batch {b}: RACE band fold ({folded} dirs) injected "
          f"between kernel and commits")
    ids_0 = None
    try:
        ids_0 = _surv_ids(surv)
        (surv.write.mode("overwrite")
         .parquet(f"{WORK}/out/batch={b}"))
        append_batch_bands(bands, band_index, b)
        append_semantic_batch(rows, sem_index, b)
        print(f"  batch {b}: first attempt survived the fold "
              f"(plans re-listed late enough)")
    except Exception as e:
        ids_0 = None
        print(f"  batch {b}: first attempt failed transiently as the "
              f"contract allows ({type(e).__name__}) — replaying")
    finally:
        bands.unpersist()
        rows.unpersist()
        band_surv.unpersist()

    # same-id replay: fresh kernel = fresh dir listing; overwrite
    # commits are idempotent over any partial first attempt
    surv_r, bands_r, rows_r, bsurv_r = \
        multi_signal_batch_against_indexes(chunk, bh, sh, b, eps=EPS)
    ids_r = _surv_ids(surv_r)
    (surv_r.write.mode("overwrite").parquet(f"{WORK}/out/batch={b}"))
    append_batch_bands(bands_r, band_index, b)
    append_semantic_batch(rows_r, sem_index, b)
    wall = time.monotonic() - t0
    for f in (bands_r, rows_r, bsurv_r):
        f.unpersist()
    if ids_0 is not None:
        assert ids_r == ids_0, (
            f"batch {b}: replay diverges from the surviving first "
            f"attempt ({len(ids_r)} vs {len(ids_0)})")

    # fold the batch's own rows into a generation, then recompute —
    # the uncontended control over the fully-relabeled index
    compact_band_index(spark, band_index)
    surv_c, bands_c, rows_c, bsurv_c = \
        multi_signal_batch_against_indexes(chunk, bh, sh, b, eps=EPS)
    ids_c = _surv_ids(surv_c)
    for f in (bands_c, rows_c, bsurv_c):
        f.unpersist()
    assert ids_r == ids_c, (
        f"batch {b}: post-relabel recompute diverges "
        f"({len(ids_r)} vs {len(ids_c)})")
    print(f"  batch {b}: band-race replay == uncontended recompute "
          f"across two folds ({len(ids_r)} survivors)")
    return wall


def _synth_corpus(spark, n: int):
    """(doc_id, text, embedding) as pure functions of doc_id. The
    SEED half (id < n/2) is unique in both signals. A SERVE doc's
    class comes from id % 100: < BAND_DUP_PCT -> exact text copy of
    the seed doc at id - n/2 (own unique embedding); next
    SEM_DUP_PCT -> unique text, embedding = seed doc's vector plus
    1% perturbation (cosine ~0.999 >> eps); else unique both ways.
    sin-mixed components are incompressible and pairwise-uncorrelated
    across ids, so unrelated cosines sit near 0."""
    half = n // 2
    cls = F.col("doc_id") % 100
    ref = F.col("doc_id") - half
    is_serve = F.col("doc_id") >= half

    def utext(idc):
        return F.format_string(
            "u%da u%db u%dc u%dd u%de u%df u%dg u%dh",
            idc, idc, idc, idc, idc, idc, idc, idc)

    def emb_of(idc, pert=None):
        # murmur3-hashed phases, not a sin LATTICE: sin(id*(j+1)*c)
        # has resonances (measured ~5% of unrelated pairs at
        # cosine >= 0.8 — every doc matched something); independent
        # hashed phases give cos ~ N(0, 1/64), so unrelated pairs
        # essentially never cross eps
        base = (f"transform(sequence(0, {DIM - 1}), "
                f"j -> sin(hash(({{id}}), j)))")
        e = base.format(id=idc)
        if pert is not None:
            e = (f"zip_with({e}, transform(sequence(0, {DIM - 1}), "
                 f"j -> 0.02 * sin(hash(({{p}}), j, 7))), "
                 f"(a, b) -> a + b)").format(p=pert)
        return F.expr(e)

    return (spark.range(n).withColumnRenamed("id", "doc_id")
            .withColumn(
                "text",
                F.when(is_serve & (cls < BAND_DUP_PCT), utext(ref))
                .when(is_serve
                      & (cls < BAND_DUP_PCT + SEM_DUP_PCT),
                      F.format_string(
                          "s%da s%db s%dc s%dd s%de s%df s%dg s%dh",
                          *([F.col("doc_id")] * 8)))
                .otherwise(utext(F.col("doc_id"))))
            .withColumn(
                "embedding",
                F.when(is_serve & (cls >= BAND_DUP_PCT)
                       & (cls < BAND_DUP_PCT + SEM_DUP_PCT),
                       emb_of("doc_id - " + str(half),
                              pert="doc_id"))
                .otherwise(emb_of("doc_id"))))


def main() -> None:
    spark = get_spark("bench-multi-signal")
    corpus = _synth_corpus(spark, N_DOCS)
    n = N_DOCS
    serve_docs = min(n // 2, BATCH_DOCS * N_BATCHES)
    seed_docs = n - serve_docs
    k = max(1, math.ceil(seed_docs / TARGET))

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    band_index = os.path.join(WORK, "band_idx")
    sem_index = os.path.join(WORK, "sem_idx")

    # doc_id is already dense 0..n-1: it IS the rank
    ranked = corpus.withColumn("_rnk", F.col("doc_id"))
    ranked.persist().count()

    t0 = time.monotonic()
    init_semantic_index(ranked.filter(F.col("_rnk") < seed_docs)
                        .select("doc_id", "embedding"),
                        sem_index, n_clusters=k, lloyd_rounds=2,
                        id_col="doc_id", train_fraction=0.2)
    print(f"N={n} seed={seed_docs} k={k} "
          f"serve={serve_docs} batch={BATCH_DOCS} "
          f"band_dup={BAND_DUP_PCT}% sem_dup={SEM_DUP_PCT}% "
          f"semantic_all={SEMANTIC_ALL} "
          f"init={time.monotonic() - t0:.1f}s")

    t0 = time.monotonic()
    sb = 0
    for lo in range(0, seed_docs, 32768):
        chunk = (ranked.filter((F.col("_rnk") >= lo)
                               & (F.col("_rnk") < min(lo + 32768,
                                                      seed_docs)))
                 .drop("_rnk"))
        _, bands, rows, band_surv = multi_signal_batch_against_indexes(
            chunk, band_index, sem_index, 1_000_000 + sb, eps=EPS)
        append_batch_bands(bands, band_index, 1_000_000 + sb)
        append_semantic_batch(rows, sem_index, 1_000_000 + sb)
        bands.unpersist()
        rows.unpersist()
        band_surv.unpersist()
        sb += 1
    folded_b = compact_band_index(spark, band_index)
    folded_s = compact_semantic_index(spark, sem_index)
    print(f"seeded {seed_docs} docs in {sb} batches + folds "
          f"({folded_b}/{folded_s} dirs) in "
          f"{time.monotonic() - t0:.1f}s")

    # the 4096-file default re-folds every ~3 batches here (floor is
    # ~2k occupied (band_id, bh_prefix) dirs + ~2k new files per
    # batch) — and MEASURED, that eagerness WINS at this index size:
    # 172 docs/s vs 140 at a 32768 bar (folds every 8 batches, but
    # accumulated live files make every probe slower than the
    # amortized 12-16 s fold). The flag exists because the balance
    # flips once the whole-index fold outgrows the per-batch live
    # listing tax (fold cost scales with index size; live tax with
    # batches-since-fold).
    band_pol = BandMaintenancePolicy(
        compact_after_batches=MAINTAIN,
        compact_over_files=_flag("--band-over-files", 4096))
    sem_pol = MaintenancePolicy(compact_after_batches=MAINTAIN,
                                requantize_over_occupancy=OVER_OCC,
                                target_cluster_rows=TARGET,
                                min_rows_for_requantize=REQ_MIN_ROWS,
                                lloyd_rounds=2, train_fraction=0.2)

    bh = open_band_index(spark, band_index)
    sh = open_semantic_index(spark, sem_index)

    walls, kernels, maints = [], [], []
    stats = {"in": 0, "band_kept": 0, "kept": 0}
    n_b = min(N_BATCHES, serve_docs // BATCH_DOCS)
    import contextlib
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from tools.audit_tasks import measure
    audit_ctx = (measure(spark) if "--audit" in sys.argv
                 else contextlib.nullcontext())
    races = []
    with audit_ctx as rec:
        try:
            for b in range(n_b):
                lo = seed_docs + b * BATCH_DOCS
                chunk = (ranked.filter((F.col("_rnk") >= lo)
                                       & (F.col("_rnk") < lo + BATCH_DOCS))
                         .drop("_rnk"))
                chunk.persist().count()
                if b in RACE_SEM_AT:
                    wall, sh = _race_sem_batch(
                        spark, chunk, b, band_index, sem_index, bh, sh)
                    walls.append(wall)
                    kernels.append(wall)
                    races.append((b, "sem"))
                    stats["in"] += BATCH_DOCS
                    # band_kept not tracked for race batches (the
                    # intermediate frame is internal to the race fn);
                    # the admission summary notes the exclusion
                    stats["kept"] += (spark.read
                                      .parquet(f"{WORK}/out/batch={b}")
                                      .count())
                    chunk.unpersist()
                    continue
                if b in RACE_BAND_AT:
                    wall = _race_band_batch(
                        spark, chunk, b, band_index, sem_index, bh, sh)
                    walls.append(wall)
                    kernels.append(wall)
                    races.append((b, "band"))
                    stats["in"] += BATCH_DOCS
                    stats["kept"] += (spark.read
                                      .parquet(f"{WORK}/out/batch={b}")
                                      .count())
                    chunk.unpersist()
                    continue
                t0 = time.monotonic()
                if SEMANTIC_ALL:
                    # control: the UN-tiered composition — both gates
                    # run over the FULL batch (the semantic tier pays
                    # assignment AND the probe pair fold for every
                    # doc, dup or not) and the verdict is the AND of
                    # the two survivor sets. The semantic survivors
                    # MUST be consumed: an earlier control that only
                    # appended `rows` never materialized the semantic
                    # verdict at all (lazy plans — the pair fold
                    # simply never ran) and read 20-45% faster than
                    # tiered, which measured nothing
                    from radio_data_pipeline_spark.streaming.dedup import (
                        dedup_batch_against_index)
                    band_surv, bands = dedup_batch_against_index(
                        chunk, bh, b)
                    band_surv.persist()
                    sem_surv, rows = semantic_dedup_batch_against_index(
                        chunk.select("doc_id", "embedding"), sh, b,
                        eps=EPS, id_col="doc_id")
                    survivors = band_surv.join(
                        F.broadcast(sem_surv.select("doc_id")),
                        "doc_id", "semi")
                else:
                    survivors, bands, rows, band_surv = \
                        multi_signal_batch_against_indexes(
                            chunk, bh, sh, b, eps=EPS)
                kernels.append(time.monotonic() - t0)

                def _surv() -> None:
                    (survivors.write.mode("overwrite")
                     .parquet(f"{WORK}/out/batch={b}"))

                def _band() -> None:
                    append_batch_bands(bands, band_index, b)

                def _sem() -> None:
                    append_semantic_batch(rows, sem_index, b)

                with ThreadPoolExecutor(max_workers=3) as ex:
                    futs = [ex.submit(inheritable_thread_target(fn))
                            for fn in (_surv, _band, _sem)]
                    for f in futs:
                        f.result()
                walls.append(time.monotonic() - t0)
                stats["in"] += BATCH_DOCS
                stats["band_kept"] += band_surv.count()
                stats["kept"] += (spark.read
                                  .parquet(f"{WORK}/out/batch={b}")
                                  .count())
                bands.unpersist()
                rows.unpersist()
                band_surv.unpersist()
                chunk.unpersist()

                t0 = time.monotonic()
                rep_b = maintain_band_index(spark, band_index, band_pol)
                rep_s = maintain_semantic_index(spark, sem_index, sem_pol)
                dt = time.monotonic() - t0
                acts = (rep_b["action"], rep_s["action"])
                if acts != ("noop", "noop"):
                    maints.append((b, acts, dt))
                    print(f"  batch {b}: band={acts[0]} sem={acts[1]} "
                          f"in {dt:.1f}s")
                if rep_s["action"] == "requantize":
                    # the held semantic handle MUST refuse to serve
                    # the next batch — staleness guard, asserted
                    from radio_data_pipeline_spark.streaming.semantic \
                        import StaleQuantizerError
                    try:
                        sh.check_fresh()
                        raise AssertionError(
                            "stale semantic handle not detected "
                            "after policy requantize")
                    except StaleQuantizerError:
                        pass
                    sh.close()
                    t0 = time.monotonic()
                    sh = open_semantic_index(spark, sem_index)
                    print(f"  batch {b}: StaleQuantizerError raised "
                          f"as required; reopened handle in "
                          f"{time.monotonic() - t0:.1f}s")
        finally:
            bh.close()
            sh.close()
    ranked.unpersist()

    third = max(1, n_b // 3)
    segs = [walls[i:i + third] for i in range(0, n_b, third)]
    seg_rate = [BATCH_DOCS * len(s) / sum(s) for s in segs if s]
    total = sum(walls)
    print(f"\nmode={'semantic-all' if SEMANTIC_ALL else 'tiered'} "
          f"batches={n_b} total={total:.1f}s "
          f"mean={total / n_b:.2f}s/batch "
          f"(kernel {sum(kernels) / n_b:.2f}s + commit "
          f"{(total - sum(kernels)) / n_b:.2f}s) "
          f"docs/s={BATCH_DOCS * n_b / total:.0f} "
          f"thirds={[f'{r:.0f}' for r in seg_rate]}")
    print(f"admission: in={stats['in']} band_kept={stats['band_kept']} "
          f"final_kept={stats['kept']} "
          f"(band drop {1 - stats['band_kept'] / stats['in']:.1%}, "
          f"semantic drop of band-kept "
          f"{1 - stats['kept'] / max(1, stats['band_kept']):.1%})")
    print(f"maintenance events: {maints}")
    if races:
        print(f"injected races (all asserts passed in-loop): {races}"
              f" — admission band_kept excludes race batches")
    if "--audit" in sys.argv:
        flags = rec.flagged()
        print(f"task audit: {len(rec.stages)} stages, "
              f"{len(flags)} byte-blind")
        for s in flags:
            print("  FLAGGED:", s)


if __name__ == "__main__":
    main()

"""Incremental semantic (SemDeDup) dedup ingest: continuous
embedding-level dedup of an arriving document stream against the
ENTIRE accumulated corpus, without re-clustering or rescanning it.

This is the semantic twin of the MinHash band-index ingest
(streaming/dedup.py): batch `functions.similarity.semantic_dedup`
answers "dedup this corpus once"; this module answers "keep deduping
as the corpus grows". The reference pipeline has no streaming surface
at all (it is a finite-observation ETL) — this tier exists for the
100 TB training-data shape: crawl shards arrive forever, and a doc
semantically duplicating ANYTHING already ingested must be dropped
cheaply, forever.

Design — quantizer frozen once, partition layout is the index:

- ``init_semantic_index`` trains the relational-Lloyd quantizer
  (functions/similarity.train_semantic_centroids — the exact code
  path the batch form and its pinned oracles prove) on a training
  frame and persists it under ``index_path/_quantizer``, with the
  resolved assignment mode riding as constant columns of the same
  dataset (one commit unit). Leading-underscore names are invisible
  to Spark's partition discovery, so the quantizer can live inside
  the index root without polluting dataset reads.
- Every processed document's (id, v, cell) row lands under
  ``index_path/ingest_batch=N/cell_bucket=B`` (B = pmod(cell,
  n_cell_buckets), the BOUNDED layout key — see
  _DEFAULT_CELL_BUCKETS) — the same per-batch-overwrite exactly-once
  layout as the band index. ALL docs are indexed (survivors AND
  dropped): a removed doc's content is still corpus history, and a
  later twin of it must still be dropped.
- A micro-batch assigns against the FROZEN quantizer —
  O(|batch|·k·d), independent of the accumulated corpus — then
  probes only the ``cell IN (its own cells)`` partitions. The probe
  join broadcasts the (micro-batch-sized) assigned batch against the
  pruned index scan: no shuffle of index data, ever.

Semantics: within a micro-batch, the batch-local SemDeDup rule
(removed iff a SMALLER-id same-cell witness has round(cosine,6) >=
eps — functions/similarity._semantic_removed); across batches,
ARRIVAL order wins (any index hit at >= eps drops the new doc). When
batches arrive in nondecreasing id order AND the quantizer equals the
batch run's trained centroids, the two orders coincide and the
stream's verdicts equal batch ``semantic_dedup`` of the full corpus —
pinned by tests/test_streaming_semantic.py.

Scale note (the honest asymptote): with a frozen k, cell occupancy
grows linearly with the corpus, so the per-batch within-cell
candidate join grows as |batch|·(corpus/k). That is the SemDeDup
paper's own serving trade — the fix when cells outgrow their budget
is ``requantize_semantic_index`` (train a larger quantizer on the
indexed corpus, fold every generation through the new cell
assignment), an offline maintenance op like band-index compaction,
not a per-batch cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import (
    _as_double,
    _dot_double,
    _semantic_removed,
    assign_to_centroids,
    l2_norm,
    prepare_assignment,
    release_assignment,
    train_semantic_centroids,
)
from .dedup import _index_has_batches


# default partition-key width of the persisted layout: rows land
# under cell_bucket = pmod(cell, n_cell_buckets), NOT under the raw
# cell id. partitionBy(cell) would create up to min(|batch|, k) dirs
# PER MICRO-BATCH — with the library's auto k = N/256, that is
# millions of directories at 100 TB and measurably pathological well
# before (§19 measured a 30-batch seed at k=782 leaving 23k one-file
# dirs; compaction spent minutes on pure listing/footer I/O). A
# bounded bucket count caps dirs per append at n_cell_buckets while
# probes keep planning-time pruning on the bucket and row-group
# min/max skipping on the cell. Like the band index's prefix_len,
# the width is BAKED INTO the layout (persisted in the quantizer
# meta): every append and probe must use the index's own value.
_DEFAULT_CELL_BUCKETS = 128

# handle-mode probe-prune threshold (r10 VERDICT #1): below this many
# CACHED generation rows the per-batch cells distinct+collect job
# costs more than the IN-filter saves (the §25c finding that removed
# the unconditional prune: 12-17 s -> 7.4-8.0 s per 2k batch at the
# 1M-row index); above it the filter's lazy-column skip of non-probed
# rows' v payloads dominates (§25d: the 10M-row point measured both
# regimes — see _finish_semantic_batch's large-index branch for the
# mechanism). Env-overridable for tests and unusual deployments.
_HANDLE_PRUNE_MIN_ROWS = int(os.environ.get(
    "RDPS_SEMANTIC_HANDLE_PRUNE_MIN_ROWS", "4000000"))


def init_semantic_index(train_df: DataFrame, index_path: str,
                        n_clusters: int, lloyd_rounds: int = 2,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        train_fraction: float = 1.0, seed: int = 7,
                        two_level: bool | None = None,
                        coarse_clusters: int | None = None,
                        seed_strategy: str | None = None,
                        n_cell_buckets: int = _DEFAULT_CELL_BUCKETS,
                        ) -> dict:
    """Train the quantizer on ``train_df`` and persist it under the
    index root. Must run ONCE before any ingest — enforced: an index
    that already holds ingested batches refuses re-initialization,
    because overwriting the quantizer would orphan every accumulated
    row's cell filing (probes would prune to NEW cells while the rows
    sit under OLD ones — silent duplicate admission, forever); growing
    k on a populated index is ``requantize_semantic_index``'s job. The
    assignment mode (two-level or flat) and the layout's cell-bucket
    width are resolved here and persisted with the centroids so every
    future probe assigns and prunes with the same shape. Returns the
    resolved meta dict."""
    spark = train_df.sparkSession
    if _index_has_batches(spark, index_path):
        raise ValueError(
            f"semantic index at {index_path} already holds ingested "
            "batches; re-initializing would orphan their cell filing "
            "— use requantize_semantic_index to retrain on a "
            "populated index")
    c, resolved = train_semantic_centroids(
        train_df, n_clusters, lloyd_rounds=lloyd_rounds,
        vec_col=vec_col, id_col=id_col, train_fraction=train_fraction,
        seed=seed, two_level=two_level, coarse_clusters=coarse_clusters,
        seed_strategy=seed_strategy)
    resolved["n_cell_buckets"] = int(n_cell_buckets)
    _write_quantizer(c, resolved, index_path, n_clusters)
    return resolved


def _write_quantizer(c: DataFrame, resolved: dict,
                     index_path: str, n_clusters: int) -> None:
    # The resolved assignment mode + layout width ride as constant
    # columns of the quantizer table itself — ONE overwrite, so no
    # crash window can pair new centroids with a stale mode (a
    # mismatch would assign probes with a different shape than the
    # index rows were filed with: silently missed matches). A crash
    # mid-overwrite leaves the dataset unreadable — probes fail
    # loudly, and requantize repairs it (it retrains from index rows,
    # never from the old quantizer). File count scales with k so the
    # write is never one multi-GB single task at auto-scale cluster
    # counts.
    (c.withColumn("two_level", F.lit(bool(resolved["two_level"])))
     .withColumn("coarse_clusters",
                 F.lit(int(resolved["coarse_clusters"])))
     .withColumn("n_cell_buckets",
                 F.lit(int(resolved["n_cell_buckets"])))
     .coalesce(max(1, n_clusters // 4096)).write.mode("overwrite")
     .parquet(f"{index_path}/_quantizer"))


def read_semantic_quantizer(spark: SparkSession,
                            index_path: str) -> tuple[DataFrame, dict]:
    """Load the persisted quantizer + its resolved assignment mode
    and layout width (constant columns of the same dataset — see
    _write_quantizer)."""
    q = spark.read.parquet(f"{index_path}/_quantizer")
    row = q.select("two_level", "coarse_clusters",
                   "n_cell_buckets").first()
    return (q.select("cluster", "pos", "cval"),
            {"two_level": bool(row["two_level"]),
             "coarse_clusters": int(row["coarse_clusters"]),
             "n_cell_buckets": int(row["n_cell_buckets"])})


from .dedup import GenerationCachedHandle as _GenerationCachedHandle


class SemanticIndexHandle(_GenerationCachedHandle):
    """An open serving handle on a persisted semantic index: the
    quantizer read ONCE, its centroids Spark-persisted, and every
    quantizer-derived assignment table precomputed and persisted
    (functions/similarity.prepare_assignment). Passing the handle to
    ``semantic_dedup_batch_against_index`` / ``stream_semantic_ingest``
    removes the per-micro-batch fixed work the r6 throughput study
    measured (~0.5 s/batch of quantizer re-read + compact-table
    rebuild — the dominant cost at small batches; BENCH_SCALING §19
    add. 3/5).

    Contract: the handle caches the quantizer, so it must be closed
    and reopened across ``requantize_semantic_index`` (which may not
    run concurrently with ingest anyway — the offline + lease
    contract); ``close()`` releases every cache it pinned.

    The contract is ENFORCED, not just documented (r8 VERDICT #1 —
    two rounds of 'a stale handle misassigns silently'): at open the
    handle snapshots the ``_quantizer`` directory's driver-side file
    metadata (names, lengths, mtimes — the same `_dir_snapshot`
    primitive the maintenance folds use), and every kernel call
    through the handle re-lists and compares before any cached table
    is used. A requantize commit overwrites the quantizer dataset
    with fresh part files, so the snapshot can never silently match
    across one — the next call raises StaleQuantizerError instead of
    filing new rows under dead cells. Cost: one FileSystem
    listStatus per kernel call — driver metadata only, no Spark job
    (measured ~1 ms against ~seconds of kernel work; §19 add. 8).

    Generation-cache mechanics (witness dedup over (cell, v), two
    src_batch-distinct representatives, spread-then-persist, fold
    detection by dir listing) live in the shared
    dedup.GenerationCachedHandle — the semantic instance groups on
    (cell, v) because the probe's verdict is an EXISTS over
    round(cosine,6) >= eps and bitwise-equal vectors give identical
    cosines (on a duplicate-dense corpus this collapses the per-batch
    pair fold by the duplication factor — measured: a tiled 200k
    index probed 5.5M pairs per 2k batch; deduped, ~the distinct
    count, §19 add. 8); vn is a pure function of v and cell_bucket
    of cell, so an arbitrary same-src_batch row is a faithful
    representative."""

    _GEN_KEYS = ("cell", "v")
    _GEN_REP_COLS = ("id", "vn", "cell_bucket", "src_batch",
                     "ingest_batch")
    _GEN_SPREAD_FACTOR = 2
    _SPREAD_LIVE_READS = True
    # range-partition + sort the cache on cell: each in-memory
    # columnar batch spans a narrow cell range, so the large-N probe
    # prune (_HANDLE_PRUNE_MIN_ROWS) rejects non-probed rows on the
    # cell vector alone and never deserializes their 64-dim v arrays
    _GEN_SORT_COL = "cell"

    def __init__(self, spark: SparkSession, index_path: str):
        from .dedup import _dir_snapshot, _hadoop_fs

        self.spark = spark
        self.path = index_path
        self.centroids, self.meta = read_semantic_quantizer(
            spark, index_path)
        self.prepared = prepare_assignment(
            self.centroids, self.meta["two_level"],
            self.meta["coarse_clusters"])
        self.centroids = self.prepared["cc"]  # the persisted frame
        self._init_generation_cache()
        try:
            # the staleness snapshot and the generation-cache build
            # both sit inside the release guard: once `prepared` is
            # pinned, ANY failed open (a transient fs error listing
            # _quantizer just as much as a failed cache build) must
            # not leak persisted frames into the shared session
            self._fs, self._qpath = _hadoop_fs(
                spark, f"{index_path}/_quantizer")
            self._qsnapshot = _dir_snapshot(self._fs, self._qpath)
            self._refresh_generations()
        except BaseException:
            self.close()
            raise

    def check_fresh(self) -> None:
        """Raise StaleQuantizerError if the persisted quantizer moved
        since this handle was opened (a requantize committed). Called
        by the kernel on every handle-mode invocation; callers doing
        their own assignment against ``handle.centroids`` should call
        it too."""
        from .dedup import _dir_snapshot

        now = _dir_snapshot(self._fs, self._qpath)
        if now != self._qsnapshot:
            raise StaleQuantizerError(
                f"semantic index handle on {self.path} is STALE: the "
                "persisted _quantizer changed since open (a "
                "requantize committed). Serving with the cached "
                "quantizer would file new rows under cells the "
                "active quantizer no longer maps — silent duplicate "
                "admission. close() this handle and "
                "open_semantic_index() a fresh one")

    def close(self) -> None:
        release_assignment(self.prepared)
        self._release_generation_cache()


class StaleQuantizerError(RuntimeError):
    """A SemanticIndexHandle outlived a requantize of its index: its
    cached quantizer no longer matches the persisted one. Reopen the
    handle."""


def open_semantic_index(spark: SparkSession,
                        index_path: str) -> SemanticIndexHandle:
    """Open a serving handle (see SemanticIndexHandle)."""
    return SemanticIndexHandle(spark, index_path)


def semantic_dedup_batch_against_index(
        batch_df: DataFrame, index, batch_id: int,
        centroids: DataFrame | None = None, meta: dict | None = None,
        eps: float = 0.4, vec_col: str = "embedding",
        id_col: str = "vec_id", dedup_identical: bool = True,
        ) -> tuple[DataFrame, DataFrame]:
    """The per-batch kernel, usable outside streaming (backfill jobs
    chunk a corpus through it with increasing batch ids). ``index``
    is either the index PATH (persisted layout: partition-pruned
    probe, own-batch replay exclusion) or an in-memory (id, v, cell)
    DataFrame of previously processed rows (or None for the first
    chunk) — the relational form the registered driver query uses so
    it needs no filesystem. Returns ``(survivors, rows)``: survivors
    are the batch rows dropped neither within the batch nor against
    the index; ``rows`` is the batch's (id, v, vn, cell, cell_bucket)
    frame, which the CALLER must append (append_semantic_batch for
    the persisted form) for the next batch to see, and unpersist when
    done (it is returned persisted — it backs every verdict branch) —
    split so a streaming wrapper can order the writes for its
    exactly-once contract.

    In path mode, ``centroids``/``meta`` default to a fresh
    ``read_semantic_quantizer`` per call (correct, and required after
    a requantize); a serving loop should pass an open
    ``SemanticIndexHandle`` as ``index`` instead — cached quantizer,
    persisted assignment tables, no per-call fixed work — and drop
    the handle across any requantize."""
    spark = batch_df.sparkSession
    prepared = None
    handle = None
    qguard = None  # (index_path, fs, qpath, snapshot) — see below
    if isinstance(index, SemanticIndexHandle):
        if centroids is not None or meta is not None:
            raise ValueError(
                "pass either a SemanticIndexHandle or explicit "
                "centroids/meta, not both")
        # staleness gate BEFORE any cached table is used: a handle
        # held across requantize_semantic_index must fail loudly, not
        # assign with the dead quantizer (driver-side metadata
        # compare, no job — see SemanticIndexHandle.check_fresh)
        index.check_fresh()
        handle = index
        centroids, meta, prepared = (index.centroids, index.meta,
                                     index.prepared)
        index = index.path
        # append-time guard input: the snapshot check_fresh just
        # validated (see _attach_quantizer_guard below)
        qguard = (index, handle._fs, handle._qpath,
                  handle._qsnapshot)
    path_mode = isinstance(index, str)
    if path_mode and handle is None:
        # snapshot the active quantizer NOW, whether or not the
        # caller supplied cached centroids: append_semantic_batch
        # re-checks it after the commit, so a requantize that swaps
        # the quantizer mid-batch fails the batch loudly instead of
        # leaving rows filed under dead cells (the path/append-time
        # sibling of the handle's check_fresh — requantize is
        # documented offline, this is defense in depth; see
        # append_semantic_batch)
        from .dedup import _dir_snapshot, _hadoop_fs

        qfs, qpath = _hadoop_fs(spark, f"{index}/_quantizer")
        qguard = (index, qfs, qpath, _dir_snapshot(qfs, qpath))
    if path_mode and (centroids is None or meta is None):
        centroids, meta = read_semantic_quantizer(spark, index)
    if centroids is None:
        raise ValueError("centroids required when index is not a path")
    if meta is None:
        # no silent default: a two-level-trained quantizer served flat
        # assigns probes with a different shape than the index rows
        # were filed with — boundary twins land in different cells and
        # duplicates pass silently (and the k·d table gets broadcast)
        raise ValueError(
            "meta required alongside caller-supplied centroids — pass "
            "the resolved dict train_semantic_centroids returned")
    if path_mode and "n_cell_buckets" not in meta:
        # no silent width default in path mode: the bucket width is
        # baked into the on-disk layout, and a cached meta from
        # train_semantic_centroids (which lacks the key) would file
        # and prune with _DEFAULT_CELL_BUCKETS while the index was
        # laid out with another width — silent duplicate admission.
        # Pass the dict read_semantic_quantizer returns (or the one
        # init_semantic_index resolved).
        raise ValueError(
            "caller-supplied meta for a persisted index must carry "
            "n_cell_buckets (the layout's bucket width) — use the "
            "meta read_semantic_quantizer returns")

    n_buckets = int(meta.get("n_cell_buckets", _DEFAULT_CELL_BUCKETS))
    # vn = precomputed l2 norm, persisted with the row: the probe and
    # within-batch pair filters are O(pairs·d) interpreted folds, and
    # hoisting the norms leaves one fold per pair instead of three
    # (bit-identical — see _semantic_removed)
    if prepared is not None and ("coarse_pack" in prepared
                                 or "flat_pack" in prepared):
        # serving fast path (r9): the handle prepared single-row
        # quantizer packs, so assignment AND the id->v join-back
        # collapse into one spread projection — the whole rows build
        # is one shuffle + one stage instead of the ~5-shuffle AQE
        # cascade (verdict-identical: _assign_points_inline)
        from ..functions.similarity import _assign_points_inline

        pv = batch_df.select(F.col(id_col).alias("vec_id"),
                             _as_double(F.col(vec_col)).alias("v"))
        a_rows = _assign_points_inline(pv, prepared, keep_v=True)
        rows = (a_rows.select(F.col("vec_id").alias("id"), "v",
                              F.col("cluster").alias("cell")))
    else:
        a = assign_to_centroids(batch_df, centroids, vec_col=vec_col,
                                id_col=id_col,
                                two_level=meta["two_level"],
                                coarse_clusters=meta["coarse_clusters"],
                                points_are_small=True,
                                prepared=prepared)
        v = batch_df.select(F.col(id_col).alias("vec_id"),
                            _as_double(F.col(vec_col)).alias("v"))
        rows = (v.join(a, "vec_id")
                .select(F.col("vec_id").alias("id"), "v",
                        F.col("cluster").alias("cell")))
    # rows is the PERSISTED frame (the caller's unpersist handle, per
    # the contract below); assigned is a zero-cost rename of it, so
    # the local rule, the probe, and the cell collect all hit the
    # same cached assignment
    rows = (rows.withColumn("vn", l2_norm(F.col("v")))
            .withColumn("cell_bucket",
                        F.pmod(F.col("cell"),
                               F.lit(n_buckets)).cast("int")))
    rows.persist()
    try:
        return _finish_semantic_batch(
            rows, batch_df, batch_id, eps, dedup_identical, handle,
            index, path_mode, n_buckets, id_col, qguard, spark)
    except BaseException:
        # the kernel owns `rows` until it returns it: a failure in
        # the remaining build (e.g. the path-mode cells collect on a
        # transient FS error) must not leak the just-persisted frame
        # into the shared session (round-10 review — the one-frame-
        # deeper sibling of the multi_signal kernel's leak guard)
        rows.unpersist()
        raise


def _finish_semantic_batch(rows, batch_df, batch_id, eps,
                           dedup_identical, handle, index, path_mode,
                           n_buckets, id_col, qguard, spark):
    """Probe + verdict construction over the persisted assignment
    frame — split out so semantic_dedup_batch_against_index can
    guarantee `rows` never leaks on a mid-build failure."""
    assigned = rows.select(F.col("id").alias("vec_id"), "v", "vn",
                           F.col("cell").alias("cluster"))

    # batch_bounded: the kernel's input is micro-batch-sized by
    # contract — the broadcast+spread form keeps the within-batch
    # pair compute off a single task (see _semantic_removed)
    dropped = _semantic_removed(assigned, eps, dedup_identical,
                                batch_bounded=True)

    idx = None
    if path_mode:
        # the handle serves the immutable generations from its Spark
        # cache and reads only the live batch dirs fresh (see
        # SemanticIndexHandle.index_frame — the per-batch generation
        # re-decode was the 2k-batch floor); a plain path re-reads
        # everything (correct, slower)
        raw = (handle.index_frame() if handle is not None
               else (spark.read.parquet(index)
                     if _index_has_batches(spark, index) else None))
        if raw is not None:
            # replay exclusion on the src_batch DATA column (stamped
            # at append, carried through compaction/requantize) — a
            # partition-value exclusion alone would stop seeing a
            # crashed attempt's rows once a fold relabeled them into
            # a generation, and the replayed batch would self-match
            # and drop entirely. The own ingest_batch partition is
            # also pruned, as planning-time shortcut for the common
            # uncompacted case.
            # ~eqNullSafe: a NULL src_batch row (no versioned writer
            # produces one; defense in depth) must stay visible —
            # plain != would NULL out and hide it from the probe
            idx = (raw
                   .filter(F.col("ingest_batch") != batch_id)
                   .filter(~F.col("src_batch")
                           .eqNullSafe(F.lit(batch_id))))
    elif index is not None:
        idx = index
    if idx is not None:
        if handle is None:
            # bounded driver metadata: <= min(|batch|, k) cell ids.
            # In path mode the derived bucket set is a planning-time
            # PARTITION prune (dirs are cell_bucket=, bounded width)
            # and the cell IN-list skips row groups via parquet
            # min/max stats; in DataFrame mode both are plain
            # filters.
            cells = [r["cluster"] for r in
                     assigned.select("cluster").distinct().collect()]
            if path_mode:
                buckets = sorted({int(c) % n_buckets for c in cells})
                idx = idx.filter(F.col("cell_bucket").isin(buckets))
            # round-robin the PRUNED scan before the pair join: the
            # pair count per index row is |batch ∩ cell|, and cell
            # sizes follow the data — a clustered corpus concentrates
            # pairs in a few hot cells whose rows sit in one or two
            # parquet splits, so the broadcast-hash join leaves 10%+
            # of all pair compute in a single task (measured at a
            # 100k-doc index, 2k batch: 4.3M pairs, 519k in ONE
            # cell; probe 13.7 s as scanned vs 2.6 s spread — AQE
            # cannot split it, the hot partition is bytes-small).
            # The shuffle moves only the rows the join reads anyway;
            # there is no aggregation across the join, so
            # round-robin placement changes nothing downstream.
            pruned = idx.filter(F.col("cell").isin(cells))
            from .dedup import spread_for_write

            pruned = spread_for_write(pruned, factor=2)
        elif handle._gen_count < _HANDLE_PRUNE_MIN_ROWS:
            # handle mode, SMALL index: the frame is the handle's
            # PERSISTED generation cache (pre-spread, memory-speed
            # scan) plus the live batch dirs, and the broadcast
            # equi-join on `cell` below IS the cell restriction
            # (inner join ⊆ any IN-filter on the same column) — so a
            # driver-literal prune would buy only row-group skipping
            # on the LIVE dirs, which are micro-batch-sized and
            # bounded by the compaction cadence (≤
            # compact_after_batches × |batch| rows), while costing
            # one eager distinct+collect JOB per batch (~2.3 s CPU
            # at k=3732 — it forces the assignment materialization
            # as its own job) plus a min(|batch|, k)-value IN-list
            # literal the planner re-optimizes every batch. Measured
            # at the 1M-row index: dropping it took 2k-doc batches
            # from ~12-17 s to ~7.4-8.0 s (§25c).
            pruned = idx
        else:
            # handle mode, LARGE index (r10 VERDICT #1): above
            # _HANDLE_PRUNE_MIN_ROWS cached rows the collect job's
            # fixed cost is repaid by what the IN-filter skips. The
            # skip mechanism is NOT batch-stat pruning (InSet never
            # reaches the cached-batch stat filter — see
            # GenerationCachedHandle._GEN_SORT_COL) but lazy
            # per-column access: the filter rejects a row on the
            # cell column vector alone, so non-probed rows — the
            # (1 - |batch cells|/k) majority, and at constant
            # occupancy |batch cells|/k shrinks as the index grows —
            # never deserialize their 64-dim v payloads, where the
            # join probe would first materialize the row. Rows
            # PASSING the filter are ≈ |batch cells| × occupancy,
            # constant in N at constant occupancy: the per-batch
            # scan term this leaves is the cheap cell-vector pass.
            # Verdicts are identical by construction (inner join ⊆
            # the IN-filter); pinned by the handle-vs-path
            # equivalence tests and the forced-threshold test.
            cells = [r["cluster"] for r in
                     assigned.select("cluster").distinct().collect()]
            pruned = idx.filter(F.col("cell").isin(cells))
        matched = (
            pruned
            .join(F.broadcast(assigned.select(
                      F.col("vec_id").alias("new_id"),
                      F.col("cluster").alias("cell"),
                      F.col("v").alias("nv"),
                      F.col("vn").alias("nvn"))),
                  "cell")
            # arrival order wins: ANY index hit drops the new doc —
            # no id comparison (prior batches hold the history).
            # dot/(vn·nvn) == cosine bit-for-bit with the norms
            # hoisted out of the per-pair hot path. The HOF fold
            # stays, in the cast-free _dot_double form (v/nv are
            # array<double> by this kernel's own construction): an
            # expanded flat a[1]*b[1]+...+a[d]*b[d] codegen
            # expression was MEASURED 3x SLOWER at d=64 / 8.6M pairs
            # (codegen splits it into 64 chained methods of bounds-
            # checked try_element_at calls; zip_with/aggregate runs a
            # specialized primitive-array loop) — don't re-try
            # without new evidence
            .filter(F.round(_dot_double(F.col("v"), F.col("nv"))
                            / (F.col("vn") * F.col("nvn")), 6)
                    >= eps)
            .select(F.col("new_id").alias("vec_id")))
        dropped = dropped.union(matched)

    # dropped is bounded by |batch| ids (micro-batch contract), so
    # the anti-join build side is broadcast STATICALLY: batch_df
    # never shuffles for the anti join, and the plan skips the AQE
    # detect-small-then-convert round a dynamic BHJ would cost on
    # every batch
    survivors = batch_df.join(
        F.broadcast(dropped.distinct().withColumnRenamed("vec_id",
                                                         id_col)),
        id_col, "left_anti")
    if qguard is not None:
        # carried to append_semantic_batch, which re-snapshots the
        # quantizer AFTER its commit and fails the batch loudly if a
        # concurrent requantize swapped it — under the streaming
        # replay contract the failed batch re-runs against the NEW
        # quantizer and its overwrite replaces the mis-filed dir
        # (self-healing), where silence would leave rows under dead
        # cells forever. _GUARD_ISSUED_PATHS makes attribute
        # shedding STRUCTURAL-loud at append time (r9 ADVICE): any
        # transformation of `rows` returns a new object without the
        # attribute, and append_semantic_batch refuses a guard-less
        # append to a path recorded here.
        rows._rdps_quantizer_guard = qguard
        _GUARD_ISSUED_PATHS.add(qguard[0])
    return survivors, rows


# index paths for which a kernel in THIS process issued a quantizer
# guard: append_semantic_batch refuses a guard-less append to one —
# the attribute channel silently sheds across any DataFrame
# transformation, so the degradation must be loud, not conventional
# (r9 ADVICE). Paths are tiny strings; the set is process-lifetime.
_GUARD_ISSUED_PATHS: "set[str]" = set()

# explicit opt-out for appends genuinely unrelated to a kernel probe
# (synthetic rows, offline refile tooling): pass as quantizer_guard
SKIP_QUANTIZER_GUARD = ("skip-quantizer-guard",)


def append_semantic_batch(rows: DataFrame, index_path: str,
                          batch_id: int,
                          quantizer_guard: tuple | None = None) -> None:
    """Commit a batch's (id, v, cell, cell_bucket) rows under their
    own ``ingest_batch=<id>`` directory (mode overwrite — replay
    replaces, never duplicates), partitioned by the BOUNDED
    cell_bucket (never the raw cell: see _DEFAULT_CELL_BUCKETS — at
    auto-scale k a per-cell layout creates millions of directories).
    Repartitioning on the bucket keeps it to one file per bucket
    directory. Rows are stamped with ``src_batch`` — the batch id as
    an immutable DATA column — so the kernel's own-batch replay
    exclusion keeps working after a fold moves the rows into a
    generation directory.

    The partition count is EXPLICIT (which opts the exchange out of
    AQE coalescing) — the fourth measured byte-blindness site, found
    by tools/audit_tasks.py on its first serving run: a micro-batch
    is ~1 MB however many bucket dirs it touches, so AQE coalesced
    the clustering shuffle to ONE partition and a single task paid
    every parquet-writer open + commit for up to n_cell_buckets
    directories sequentially — 2.4 s of the ~7 s 2k-batch wall,
    ~0.3 s spread (§19 add. 8). Each bucket still hashes to exactly
    one reducer, so the one-file-per-dir layout is unchanged."""
    from .dedup import spread_for_write

    # resolve the guard BEFORE the write: the guard-less refusal
    # below must keep unguarded rows OUT of the index — raising
    # after the parquet commit would leave exactly the rows the
    # refusal exists to block standing committed (round-10 review)
    guard = quantizer_guard if quantizer_guard is not None else \
        getattr(rows, "_rdps_quantizer_guard", None)
    if guard is SKIP_QUANTIZER_GUARD:
        guard = None
    elif guard is None and index_path in _GUARD_ISSUED_PATHS:
        raise ValueError(
            f"append_semantic_batch: no quantizer guard on rows "
            f"destined for {index_path}, but a kernel probed this "
            "index in this process — the rows object was transformed "
            "after the kernel returned it, shedding the append-time "
            "requantize defense. Pass quantizer_guard= (the tuple "
            "from the kernel rows' _rdps_quantizer_guard) to keep "
            "the check, or SKIP_QUANTIZER_GUARD for an append "
            "genuinely unrelated to a kernel probe.")

    (spread_for_write(rows.withColumn("src_batch", F.lit(batch_id)),
                      "cell_bucket")
     .write.mode("overwrite").partitionBy("cell_bucket")
     .parquet(f"{index_path}/ingest_batch={batch_id}"))
    # quantizer guard (attached by the kernel): re-snapshot AFTER the
    # commit. A concurrent requantize_semantic_index that swapped the
    # quantizer while this batch assigned/committed would leave these
    # rows filed under DEAD cells — probes with the new quantizer
    # would never find them, silent duplicate admission forever.
    # Requantize is documented offline (its own writer-recheck aborts
    # when an append lands before its commit point), so this should
    # never fire in a correct deployment; when it does, failing the
    # batch is SELF-HEALING: the streaming replay recomputes against
    # the new quantizer and this same overwrite replaces the
    # mis-filed dir. Checked post-write so the swap window during the
    # write itself is covered; cost is one driver listing (~1 ms
    # local). Only checked when the append targets the index the
    # kernel probed.
    # The attribute channel survives only when the caller appends the
    # exact ``rows`` object the kernel returned (as every wrapper and
    # the backfill do) — any DataFrame transformation returns a new
    # Python object without it. The shedding is made STRUCTURAL-loud
    # (r9 ADVICE) by the PRE-write refusal above: a guard-less append
    # to an index path the kernel has probed in this process never
    # reaches the write. Transform-then-append callers pass the tuple
    # from ``rows._rdps_quantizer_guard``; genuinely kernel-free
    # appends pass SKIP_QUANTIZER_GUARD.
    if guard is not None and guard[0] == index_path:
        from .dedup import _dir_snapshot

        _, qfs, qpath, snap = guard
        if _dir_snapshot(qfs, qpath) != snap:
            raise RuntimeError(
                f"append_semantic_batch: the quantizer at "
                f"{index_path} changed between this batch's "
                "assignment and its index commit — a concurrent "
                "requantize ran against a live ingest (the op is "
                "documented offline). The batch's rows were filed "
                "under the OLD cells and must not stand: replay the "
                "batch (the per-batch overwrite replaces them, "
                "re-assigned under the new quantizer).")


def compact_semantic_index(spark: SparkSession, index_path: str,
                           generation: int = -1,
                           _post_fold_hook=None) -> int:
    """Fold every ``ingest_batch=*`` directory into one new
    consolidated generation — the band-index compactor
    (streaming/dedup.compact_band_index) applied to the semantic
    layout: same strictly-decreasing negative generation ids, same
    write-new-then-delete-sources crash-safety-by-existential-
    matching argument (duplicate (id, v, cell) rows cannot change an
    "exists a witness at >= eps" verdict), same snapshot-and-recheck
    writer-race guard. The ``_quantizer`` files are untouched (the
    fold lists only ``ingest_batch=`` directories). Returns the
    number of source directories folded and deleted."""
    from .dedup import _compact_ingest_index

    return _compact_ingest_index(
        spark, index_path,
        data_cols=("id", "v", "vn", "cell", "cell_bucket", "src_batch"),
        partition_cols=("cell_bucket",), generation=generation,
        _post_fold_hook=_post_fold_hook)


def requantize_semantic_index(spark: SparkSession, index_path: str,
                              n_clusters: int, lloyd_rounds: int = 2,
                              train_fraction: float = 1.0, seed: int = 7,
                              two_level: bool | None = None,
                              coarse_clusters: int | None = None,
                              seed_strategy: str | None = None,
                              n_cell_buckets: int = _DEFAULT_CELL_BUCKETS,
                              generation: int = -1,
                              _pre_swap_hook=None) -> int:
    """Retrain the quantizer on the INDEXED corpus and re-file every
    accumulated (id, v) row under the new cell assignment — the
    maintenance op for when a frozen quantizer's cells outgrow their
    per-cell candidate budget (cell occupancy grows as corpus/k; this
    resets k to match the corpus the index has actually accumulated).
    Offline like compaction: it must not run concurrently with ingest.

    Commit protocol — the quantizer swap is the commit point, ordered
    so every crash window leaves a SOUND index (a probe can only gain
    candidates, and a candidate only drops a doc via a true
    cosine >= eps match; the hazard to design out is MISSED rows,
    i.e. rows filed under cells the active quantizer no longer maps
    their vectors to):

    1. read all generations, retrain at ``n_clusters`` on the distinct
       (id, v) corpus, re-assign every row, write one new generation
       (strictly decreasing negative id, like compaction). Crash here:
       the OLD quantizer is still active and the old generations are
       untouched and correctly filed — the new generation is only
       extra candidates. Re-running repairs (it re-reads everything,
       and (id, v) distinct collapses the double copies).
    2. re-list and snapshot-check the sources: if any ``ingest_batch``
       directory changed or appeared since step 1's listing, a writer
       raced — the new generation is deleted (it was never active) and
       RuntimeError is raised. A racing batch assigned with the OLD
       quantizer would be mis-filed the moment the NEW one activates,
       which no later fold of cell values can repair — so the race
       refuses to commit rather than admit duplicates silently.
    3. overwrite ``_quantizer`` (centroids + mode columns, ONE
       dataset — no window can pair new centroids with a stale
       mode). A crash midway through the non-atomic overwrite leaves
       it unreadable: probes fail LOUDLY (never silently wrong), and
       re-running this op repairs it — requantize retrains from the
       index rows, never from the old quantizer.
    4. delete the old source directories (snapshot-checked, as in
       compaction). Crash here: new quantizer + new generation are
       complete; leftover old-cell rows are extra candidates only.

    Returns the number of source directories folded and deleted."""
    from .dedup import (
        _dir_snapshot,
        _ingest_dirs,
        _next_generation,
        maintenance_lease,
    )

    if generation >= 0:
        raise ValueError("requantize generation must be negative — "
                         "nonnegative ids are live foreachBatch ids")
    with maintenance_lease(spark, index_path,
                           "requantize") as lease_refresh:
        fs, jpath, sources = _ingest_dirs(spark, index_path)
        new_gen = _next_generation(sources, generation)
        snapshots = {p.toString(): _dir_snapshot(fs, p)
                     for p in sources}
        # READ paths filter out data-less dirs (zero-row appends —
        # a _SUCCESS-only dir listed FIRST would fail the schema
        # probe below; same fix as the compactor). The dirs stay in
        # `sources`/`snapshots`: the post-commit delete pass folds
        # them away like the compactor does.
        from .dedup import _nonempty_dirs

        src_paths = [p.toString() for p in _nonempty_dirs(fs, sources)]
        if not src_paths:
            raise ValueError(f"semantic index at {index_path} has no "
                             "ingested rows to requantize from")

        # Auto-broadcast hazard (measured: the 2M x 64-d refile died
        # at 1053 MiB of collected task results against the 1 GiB
        # driver.maxResultSize default — post-distinct AQE stats see
        # COMPRESSED shuffle bytes, and embedding rows compress
        # ~10:1) is handled with PER-JOIN merge hints on every
        # corpus-scaled join in this lineage (the refile join below;
        # the Lloyd update and two-level fine joins inside
        # functions/similarity — hinted in their corpus regime), NOT
        # by toggling spark.sql.autoBroadcastJoinThreshold
        # session-wide: the session conf is left untouched, so
        # concurrent queries on the same session keep their broadcast
        # joins (r6 VERDICT #4). The library's EXPLICIT F.broadcast
        # choices (the sqrt(k)-row coarse table, bounded seed tables)
        # are unaffected either way.
        return _requantize_body(
            spark, index_path, n_clusters, lloyd_rounds,
            train_fraction, seed, two_level, coarse_clusters,
            seed_strategy, n_cell_buckets, new_gen, fs, jpath,
            sources, snapshots, src_paths, _pre_swap_hook,
            lease_refresh)


def _requantize_body(spark, index_path, n_clusters, lloyd_rounds,
                     train_fraction, seed, two_level, coarse_clusters,
                     seed_strategy, n_cell_buckets, new_gen, fs, jpath,
                     sources, snapshots, src_paths,
                     _pre_swap_hook, lease_refresh=lambda: None) -> int:
    from .dedup import _dir_snapshot, _ingest_dirs

    from pyspark import StorageLevel

    # src_batch rides along: re-filed rows keep their origin batch id
    # so a crashed-then-replayed batch still excludes its own rows
    # (ids are unique per doc, so distinct is per-row, not per-copy);
    # vn too — it is a pure function of v, no need to recompute.
    # PERSISTED (one scan feeds the whole lineage — Lloyd rounds,
    # assignment, both sides of the refile join; MEMORY_AND_DISK
    # because the offline op may hold a corpus bigger than executor
    # memory), and schema PROBED from one source dir: a multi-path
    # parquet read otherwise fires one sequential driver-side
    # schema-inference job PER PATH (~0.2 s each — measured as the
    # leading edge of the r7 source-dir variance, §21; the trailing
    # edge was _dir_snapshot's py4j walk, fixed in streaming/dedup).
    # Every generation/batch is written by the same code path, so
    # one dir's schema is the set's schema.
    probe_schema = (spark.read.option("basePath", index_path)
                    .parquet(src_paths[0]).schema)
    corpus = (spark.read.schema(probe_schema)
              .option("basePath", index_path)
              .parquet(*src_paths)
              .select("id", "v", "vn", "src_batch").distinct()
              .persist(StorageLevel.MEMORY_AND_DISK))
    # corpus-sized caches must not outlive a FAILED op either (disk
    # full, executor loss — realistic at ~8 min on 2M rows): release
    # in a finally on EVERY exit, not just the success and raced
    # paths (review r9)
    c = None
    try:
        c, resolved = train_semantic_centroids(
            corpus, n_clusters, lloyd_rounds=lloyd_rounds, vec_col="v",
            id_col="id", train_fraction=train_fraction, seed=seed,
            two_level=two_level, coarse_clusters=coarse_clusters,
            seed_strategy=seed_strategy)
        resolved["n_cell_buckets"] = int(n_cell_buckets)
        # the refile write below and the quantizer write after the swap
        # check both materialize c — persisting it keeps the Lloyd
        # retrain (the dominant cost) from executing twice
        c = c.persist()
        # the op scales linearly with corpus size (measured ~8 min at 2M
        # rows): touch the lease between phases so a LIVE run never ages
        # past the crashed-op TTL and loses its exclusion mid-op
        lease_refresh()
        a = assign_to_centroids(corpus, c, vec_col="v", id_col="id",
                                two_level=resolved["two_level"],
                                coarse_clusters=resolved["coarse_clusters"])
        # merge-hint: BOTH sides are corpus-sized, but the post-distinct
        # AQE stats see COMPRESSED shuffle bytes, and vector rows compress
        # ~10:1 — a corpus that stats under the broadcast threshold
        # serializes past spark.driver.maxResultSize when the broadcast is
        # built (measured: 2M x 64-d refile died at 1053 MiB of task
        # results against the 1 GiB default). At index scale neither side
        # of this join should ever broadcast.
        refiled = (corpus.join(a.withColumnRenamed("vec_id", "id")
                               .hint("merge"), "id")
                   .select("id", "v", "vn", F.col("cluster").alias("cell"),
                           "src_batch")
                   .withColumn("cell_bucket",
                               F.pmod(F.col("cell"),
                                      F.lit(int(n_cell_buckets)))
                               .cast("int")))
        # explicit partition count (fifth byte-blindness site, found
        # by the task audit in the compaction fold — same class, same
        # fix): a column-only repartition is AQE-coalescible on
        # COMPRESSED shuffle bytes, and vector rows compress ~10:1,
        # so a small-corpus refile collapses its writer opens + dir
        # commits into a handful of tasks. Keys still hash to one
        # reducer each: layout unchanged.
        from .dedup import spread_for_write

        (spread_for_write(refiled, "cell_bucket")
         .write.mode("overwrite").partitionBy("cell_bucket")
         .parquet(f"{index_path}/ingest_batch={new_gen}"))

        lease_refresh()
        if _pre_swap_hook is not None:  # test seam: writer racing the op
            _pre_swap_hook()
        new_gen_path = spark._jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/ingest_batch={new_gen}")
        # dir names are unique under one index root — comparing names
        # sidesteps scheme-qualification differences (file:/ vs bare path)
        now_names = {p.getName() for p in _ingest_dirs(spark,
                                                       index_path)[2]}
        raced = (now_names - {f"ingest_batch={new_gen}"}
                 != {p.getName() for p in sources}
                 or any(_dir_snapshot(fs, p) != snapshots[p.toString()]
                        for p in sources if fs.exists(p))
                 or any(not fs.exists(p) for p in sources))
        if raced:
            fs.delete(new_gen_path, True)
            raise RuntimeError(
                "a writer raced requantize_semantic_index: an ingest_batch "
                "directory changed or appeared after the fold's listing; "
                "the quantizer swap was aborted (old index still active "
                "and sound) — quiesce ingest and re-run")

        _write_quantizer(c, resolved, index_path, n_clusters)
        deleted = 0
        for p in sources:
            if (fs.exists(p)
                    and _dir_snapshot(fs, p) == snapshots[p.toString()]):
                fs.delete(p, True)
                deleted += 1
        return deleted
    finally:
        if c is not None:
            c.unpersist()
        corpus.unpersist()


class MaintenancePolicy:
    """Thresholds for ``maintain_semantic_index``. All signals are
    CHEAP (driver-side listings + parquet-footer counts — the same
    cost class as the compactor's own change detector):

    - ``compact_after_batches``: fold when at least this many LIVE
      (nonnegative-id) ``ingest_batch`` dirs have accumulated — §19
      measured probe listing cost growing with dir count, and
      compaction restoring it (930→310 dirs → probe 2.9→1.5 s).
    - ``requantize_over_occupancy``: retrain when mean rows-per-cell
      exceeds this multiple of ``target_cluster_rows`` — per-batch
      probe work grows as corpus/k (the module docstring's honest
      asymptote), and requantize resets k to ceil(rows/target).
    - ``min_rows_for_requantize``: below this corpus size the probe
      cost cannot matter; never requantize (guards a freshly seeded
      index whose k was deliberately small).

    Precedence: requantize (which folds every generation anyway)
    beats compact beats no-op."""

    def __init__(self, compact_after_batches: int = 8,
                 requantize_over_occupancy: float = 4.0,
                 target_cluster_rows: int = 256,
                 min_rows_for_requantize: int = 10_000,
                 lloyd_rounds: int = 2,
                 train_fraction: float = 1.0):
        self.compact_after_batches = int(compact_after_batches)
        self.requantize_over_occupancy = float(
            requantize_over_occupancy)
        self.target_cluster_rows = int(target_cluster_rows)
        self.min_rows_for_requantize = int(min_rows_for_requantize)
        self.lloyd_rounds = int(lloyd_rounds)
        self.train_fraction = float(train_fraction)


def _quantizer_k_local(spark: SparkSession,
                       index_path: str) -> int | None:
    """Distinct quantizer cluster count read driver-side via pyarrow
    for local (file:/) indexes — job-free (0.2 s vs a Spark distinct
    job; same rationale as _footer_rows_local). None for non-local
    schemes."""
    import glob as _glob
    import os as _os

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from .dedup import _hadoop_fs

    _, qpath = _hadoop_fs(spark, f"{index_path}/_quantizer")
    uri = qpath.toUri()
    if uri.getScheme() not in (None, "file"):
        return None
    if not _os.path.isdir(uri.getPath()):
        # parity with the Spark fallback, which raises PATH_NOT_FOUND:
        # a missing quantizer means "not a semantic index" (typo'd
        # path, never-initialized dir) and must fail loudly — a
        # silent k=0 here would make maintain_semantic_index report
        # noop forever instead of surfacing the bad path
        raise FileNotFoundError(
            f"no _quantizer directory under {index_path} — not an "
            "initialized semantic index (init_semantic_index first)")
    ks: set = set()
    for f in _glob.glob(_os.path.join(uri.getPath(), "*.parquet")):
        ks.update(_pc.unique(
            _pq.read_table(f, columns=["cluster"])["cluster"]
        ).to_pylist())
    return len(ks)


def semantic_index_signals(spark: SparkSession,
                           index_path: str) -> dict:
    """The cheap observables a maintenance decision reads: live batch
    dir count, generation count, file count, indexed row count
    (parquet footer metadata — no data pages), quantizer size k, and
    mean cell occupancy. For local indexes rows and k are read
    driver-side via pyarrow footers/columns with NO Spark job —
    Spark's parquet count() scans data pages (aggregate pushdown is
    off by default) and was costing ~1.8 s per NOOP maintenance call
    at a 200k-row index, ~30% of the serving cadence."""
    from .dedup import _dir_snapshot, _footer_rows_local, _ingest_dirs

    fs, _, dirs = _ingest_dirs(spark, index_path)
    ids = [int(p.getName().split("=", 1)[1]) for p in dirs]
    # _dir_snapshot walks local paths in Python (the per-file py4j
    # iterator costs ~6 round trips/file — the exact driver tax §21
    # measured and removed from the folds; review r9)
    n_files = sum(len(_dir_snapshot(fs, p)) for p in dirs)
    n_rows = _footer_rows_local(dirs) if dirs else 0
    if n_rows is None:  # non-local scheme: Spark fallback
        n_rows = spark.read.parquet(index_path).count()
    k = _quantizer_k_local(spark, index_path)
    if k is None:
        k = (spark.read.parquet(f"{index_path}/_quantizer")
             .select("cluster").distinct().count())
    return {
        "live_batches": sum(1 for i in ids if i >= 0),
        "generations": sum(1 for i in ids if i < 0),
        "files": n_files,
        "rows": int(n_rows),
        "k": int(k),
        "occupancy": (n_rows / k) if k else 0.0,
    }


def decide_maintenance(signals: dict,
                       policy: MaintenancePolicy) -> tuple[str, dict]:
    """The pure decision function (test-pinned as a table): returns
    ``(action, params)`` with action one of 'noop' | 'compact' |
    'requantize'."""
    if (signals["rows"] >= policy.min_rows_for_requantize
            and signals["k"] > 0
            and signals["occupancy"] >= (
                policy.requantize_over_occupancy
                * policy.target_cluster_rows)):
        import math
        new_k = max(1, math.ceil(signals["rows"]
                                 / policy.target_cluster_rows))
        return "requantize", {"n_clusters": new_k}
    if signals["live_batches"] >= policy.compact_after_batches:
        return "compact", {}
    return "noop", {}


def maintain_semantic_index(spark: SparkSession, index_path: str,
                            policy: MaintenancePolicy | None = None,
                            dry_run: bool = False) -> dict:
    """Read the cheap signals, decide, and (unless ``dry_run``) run
    the chosen maintenance op — the policy loop a serving deployment
    calls between batches or on a timer (r8 VERDICT #5). Each heavy
    op takes the maintenance lease itself, so concurrent maintainers
    exclude each other exactly as direct callers do; this function
    adds no second locking layer (the decide-then-act gap is closed
    by the ops' own lease + snapshot guards — a raced fold refuses
    to commit rather than act on stale listings).

    Returns ``{"action", "params", "signals", "result"}`` where
    result is the op's return value (dirs folded), or None for
    noop/dry_run. The quantizer's layout width (n_cell_buckets) is
    preserved across a policy-driven requantize."""
    policy = policy or MaintenancePolicy()
    signals = semantic_index_signals(spark, index_path)
    action, params = decide_maintenance(signals, policy)
    report = {"action": action, "params": params,
              "signals": signals, "result": None}
    if dry_run or action == "noop":
        return report
    if action == "compact":
        report["result"] = compact_semantic_index(spark, index_path)
        return report
    _, meta = read_semantic_quantizer(spark, index_path)
    report["result"] = requantize_semantic_index(
        spark, index_path, n_clusters=params["n_clusters"],
        lloyd_rounds=policy.lloyd_rounds,
        train_fraction=policy.train_fraction,
        n_cell_buckets=meta["n_cell_buckets"])
    return report


def stream_semantic_ingest(stream_df: DataFrame, index_path: str,
                           out_path: str, checkpoint: str,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id", eps: float = 0.4,
                           dedup_identical: bool = True,
                           query_name: str = "semantic_ingest",
                           handle: SemanticIndexHandle | None = None,
                           maintenance_policy: MaintenancePolicy | None = None):
    """Streaming semantic-dup gate: survivors of each micro-batch
    land under ``out_path/batch=N``, every processed doc's (id, v,
    cell) row lands in the semantic index. Requires
    ``init_semantic_index`` to have run first (the quantizer must be
    frozen before any verdict) and a checkpoint (the per-batch
    overwrite layout is only exactly-once under a checkpointed
    batch-id sequence). The survivor write and the index append run
    CONCURRENTLY — both are per-batch-dir overwrites, and the
    kernel's own-batch probe exclusion makes every crash
    interleaving (either write present, absent, or partial) replay
    to the identical result. Returns the StreamingQuery.

    ``handle``: an open SemanticIndexHandle on ``index_path`` — the
    serving configuration (quantizer cached once, per-batch fixed
    work gone; measured 4–7x docs/s at 2k-doc batches, §19 add. 5).
    The caller owns its lifetime: keep it open for the query's
    duration, close it after, reopen across a requantize. Without
    it each micro-batch re-reads the quantizer (correct, slower).

    ``maintenance_policy``: run ``maintain_semantic_index`` inside
    ``foreachBatch`` AFTER each batch's commits — serve+maintain in
    one call. Micro-batches are sequential, so in-stream maintenance
    never runs concurrently with ingest (the offline-requantize
    contract holds batch-wise), and a crash between commit and
    maintenance replays the identical batch then re-decides.
    Composition with ``handle``: compactions compose transparently
    (the handle refreshes its generation cache by dir listing), but
    a policy REQUANTIZE would strand the caller-owned handle on the
    dead quantizer — the wrapper FAILS THE QUERY loudly in that case
    rather than serving stale or silently swapping a handle the
    caller also holds. Pass ``handle=None`` (per-batch quantizer
    re-read — always fresh, slower) for a policy that may
    requantize, or cap the policy so it cannot."""
    if checkpoint is None:
        raise ValueError(
            "stream_semantic_ingest requires a checkpoint location; "
            "the per-batch overwrite layout is only exactly-once "
            "under a checkpointed batch-id sequence")
    if handle is not None and handle.path != index_path:
        raise ValueError(
            f"handle is open on {handle.path}, not {index_path}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            survivors, rows = semantic_dedup_batch_against_index(
                batch_df, handle if handle is not None else index_path,
                batch_id, eps=eps,
                vec_col=vec_col, id_col=id_col,
                dedup_identical=dedup_identical)
            try:
                # the two commits run CONCURRENTLY (r8 VERDICT #3 —
                # the small-batch floor is a chain of sequential
                # job-group floors): both read only the PERSISTED
                # rows/batch_df caches, write to disjoint paths, and
                # every crash interleaving replays to the identical
                # result — each write is a per-batch-dir overwrite,
                # and the kernel's own-batch exclusion (partition
                # prune + src_batch data column) makes a replayed
                # batch blind to its own crashed index append, so
                # "index committed but survivors not" (the one
                # ordering the old sequential form excluded) is as
                # replay-sound as the reverse. Measured: -1.5 s of
                # the ~7 s 2k-batch wall (§19 add. 8).
                from concurrent.futures import ThreadPoolExecutor

                def _surv() -> None:
                    (survivors.write.mode("overwrite")
                     .parquet(f"{out_path}/batch={batch_id}"))

                def _idx() -> None:
                    append_semantic_batch(rows, index_path, batch_id)

                # inheritable_thread_target propagates the
                # streaming query's job group / local properties to
                # the pool threads — without it query.stop()'s
                # group-based cancellation cannot reach in-flight
                # commit jobs and UI attribution is lost (review r9)
                from pyspark import inheritable_thread_target

                with ThreadPoolExecutor(max_workers=2) as ex:
                    fut_s = ex.submit(inheritable_thread_target(_surv))
                    fut_i = ex.submit(inheritable_thread_target(_idx))
                    fut_s.result()
                    fut_i.result()
            finally:
                rows.unpersist()
        finally:
            batch_df.unpersist()
        if maintenance_policy is not None:
            import warnings as _warnings

            from .dedup import MaintenanceLeaseHeld

            spark = batch_df.sparkSession
            try:
                rep = maintain_semantic_index(spark, index_path,
                                              maintenance_policy)
            except MaintenanceLeaseHeld as e:
                # transient contention with an external maintainer:
                # skip the round, never kill the ingest query whose
                # commits already landed (review r9). Countable for
                # alerting via maintenance_skips() (r9 VERDICT #5).
                from .dedup import record_maintenance_skip
                record_maintenance_skip(index_path,
                                        "semantic_ingest", str(e))
                _warnings.warn(
                    f"in-stream maintenance skipped this round: {e}",
                    RuntimeWarning, stacklevel=2)
                rep = {"action": "noop"}
            if rep["action"] == "requantize" and handle is not None:
                raise RuntimeError(
                    "stream_semantic_ingest: the maintenance policy "
                    "requantized mid-stream while a caller-owned "
                    "handle is held — the handle's cached quantizer "
                    "is now stale and the wrapper will not serve "
                    "with it or swap it behind the caller's back. "
                    "Restart the stream with a fresh handle, or run "
                    "with handle=None / a non-requantizing policy. "
                    "(The index itself is consistent: the requantize "
                    "committed and this batch's writes landed "
                    "before it.)")

    return (stream_df.writeStream.foreachBatch(write_batch)
            .queryName(query_name).trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start())

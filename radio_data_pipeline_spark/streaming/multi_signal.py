"""Composed multi-signal streaming ingest gate: MinHash-LSH band
dedup THEN embedding-cosine semantic dedup, per micro-batch, against
both persistent indexes — the live form of the registered
`dedup_multi_signal` batch query (plans/llm.py), and the shape a
production training-data ingest actually deploys: every arriving
shard passes the cheap textual gate first, and only its survivors pay
the expensive semantic signal.

Semantics (pinned by tests/test_streaming_multi_signal.py): the gate
is the SEQUENTIAL COMPOSITION of the two single-signal gates —
`stream_dedup_ingest`'s band verdict over the full arriving stream,
then `stream_semantic_ingest`'s semantic verdict over the band gate's
survivor stream. Equivalently: chunking a corpus through
`multi_signal_batch_against_indexes` with increasing batch ids yields
exactly the docs that survive both accumulated gates in arrival
order.

Index-content rule, per tier:

- The BAND index receives every processed doc's bands — survivors
  AND dropped — inheriting streaming/dedup.py's chain rule (a doc
  duplicating an already-dropped doc must still be dropped).
- The SEMANTIC index receives rows for exactly the docs the band
  tier ADMITTED (including those the semantic tier then drops —
  the same all-processed rule, applied to the semantic gate's own
  input stream). Band-rejected docs never reach the semantic index:
  they pay no assignment compute, and their textual near-twin's
  embedding stands in for them at the semantic tier — the same
  candidates-only approximation the batch `dedup_multi_signal`
  query makes.

Exactly-once: all three commits (survivors, band append, semantic
append) are per-batch-dir overwrites keyed by the checkpointed batch
id, and BOTH kernels exclude their own batch's prior index rows on
the ``src_batch`` data column — so every crash interleaving of the
three concurrent writes replays to the identical result: the band
verdict replays identically (own-batch exclusion), hence the semantic
kernel sees the identical survivor frame, hence its verdict replays
identically too (its own exclusion covers the semantic append's
crash window). Compaction between crash and replay is covered by
``src_batch`` surviving the fold in both index formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dedup import (
    _PREFIX_LEN,
    BandIndexHandle,
    BandMaintenancePolicy,
    append_batch_bands,
    dedup_batch_against_index,
    maintain_band_index,
)
from .semantic import (
    MaintenancePolicy,
    SemanticIndexHandle,
    append_semantic_batch,
    maintain_semantic_index,
    semantic_dedup_batch_against_index,
)


def multi_signal_batch_against_indexes(
        batch_df: DataFrame, band_index, semantic_index,
        batch_id: int, text_col: str = "text",
        id_col: str = "doc_id", vec_col: str = "embedding",
        n_hashes: int = 8, band_size: int = 2, k: int = 3,
        prefix_len: int = _PREFIX_LEN, eps: float = 0.4,
        dedup_identical: bool = True,
        ) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The per-batch kernel, usable outside streaming (backfill jobs
    chunk a corpus through it with increasing batch ids). ``band_index``
    is a path or an open BandIndexHandle; ``semantic_index`` a path or
    an open SemanticIndexHandle. Returns ``(survivors, bands, rows,
    band_survivors)``: ``survivors`` passed BOTH gates; ``bands`` is
    the FULL batch's band table (all processed docs — the caller
    appends it via append_batch_bands); ``rows`` is the
    band-survivors' semantic frame (the caller appends it via
    append_semantic_batch); ``band_survivors`` is the intermediate
    frame the semantic stage consumed. ``bands``, ``rows``, and
    ``band_survivors`` are returned persisted (they back the
    verdicts) — the caller unpersists all three after the commits.

    The composition recomputes nothing expensive: the band stage's
    survivor frame is persisted before the semantic kernel derives
    its assignment rows from it, so the band index probe runs once
    per batch however the three outputs are consumed (without the
    persist, every broadcast subquery over the band-dropped set —
    one per commit job — would re-run the pruned index scan)."""
    band_survivors, bands = dedup_batch_against_index(
        batch_df, band_index, batch_id, text_col=text_col,
        id_col=id_col, n_hashes=n_hashes, band_size=band_size,
        k=k, prefix_len=prefix_len)
    # persisted: feeds the semantic kernel's rows AND the final
    # survivor anti-join — without it the band probe would run twice
    band_survivors.persist()
    try:
        survivors, rows = semantic_dedup_batch_against_index(
            band_survivors, semantic_index, batch_id, eps=eps,
            vec_col=vec_col, id_col=id_col,
            dedup_identical=dedup_identical)
    except BaseException:
        # callers' unpersist-finally blocks wrap only the COMMITS; a
        # semantic-stage raise (StaleQuantizerError, quantizer read
        # failure) here would leak the two already-persisted frames
        # into the shared session (r9 ADVICE)
        bands.unpersist()
        band_survivors.unpersist()
        raise
    # NOTE on the concurrent commits downstream: rows/band_survivors
    # are returned persisted but LAZY — safe, because Spark's
    # BlockManager serializes concurrent computation of the same
    # cached partition (getOrElseUpdate block locks), so two commit
    # threads cannot duplicate the assignment work. An eager
    # rows.count() barrier here was tried and measured as pure
    # overhead (one extra job per batch, commit walls unchanged).
    return survivors, bands, rows, band_survivors


def backfill_multi_signal(corpus_df: DataFrame, band_index_path: str,
                          semantic_index_path: str, out_path: str,
                          chunk_rows: int = 100_000,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          vec_col: str = "embedding",
                          n_hashes: int = 8, band_size: int = 2,
                          k: int = 3, prefix_len: int = _PREFIX_LEN,
                          eps: float = 0.4,
                          dedup_identical: bool = True,
                          batch_offset: int = 1_000_000,
                          band_policy: BandMaintenancePolicy | None = None,
                          semantic_policy: MaintenancePolicy | None = None,
                          _post_chunk_hook=None) -> dict:
    """Chunk a large corpus through the composed gate with CRASH
    RESUME — the offline counterpart of stream_multi_signal_ingest
    (a backfill that dies at chunk 37 of 400 must not redo 36 chunks
    or, worse, re-admit their dups). Hand-rolls the streaming
    checkpoint pattern for batch:

    - The chunk PLAN (id-quantile boundaries + every semantic-
      affecting parameter) is computed once and persisted to
      ``out_path/_backfill/plan.json``; a resume READS the plan
      instead of recomputing it, so boundaries cannot drift between
      attempts (approxQuantile is not deterministic enough to
      recompute) and changed parameters are rejected loudly.
    - Each chunk runs the kernel at batch id ``batch_offset + i``
      (offset so a later streaming deployment's checkpointed ids
      can never collide with backfill ids — the bench's 1e6 rule),
      commits its three per-batch-dir overwrites, then writes a
      ``done_<i>`` marker. Crash anywhere before the marker replays
      the WHOLE chunk on resume — identical results by the kernels'
      own-batch exclusions, and the overwrites replace any partial
      commit. Skewed ids that collapse quantile boundaries produce
      empty chunks; their zero-row appends are tolerated by every
      reader (see the _nonempty_dirs filters).
    - ``band_policy`` / ``semantic_policy`` run between chunks,
      sequential with ingest, exactly as the in-stream loops order
      them. A policy requantize composes here (each chunk re-reads
      the quantizer in path mode).

    Requires an INITIALIZED semantic index (init_semantic_index —
    auto-init would silently train the quantizer on chunk 0 alone).
    Numeric ``id_col`` only (boundaries are JSON-persisted floats).
    Returns {"chunks", "resumed_from", "ran"}."""
    import json
    import math

    spark = corpus_df.sparkSession
    from pyspark.sql import functions as F

    from .dedup import _hadoop_fs, _read_small_text, _write_small_text

    params = {"chunk_rows": int(chunk_rows), "text_col": text_col,
              "id_col": id_col, "vec_col": vec_col,
              "n_hashes": n_hashes, "band_size": band_size, "k": k,
              "prefix_len": prefix_len, "eps": eps,
              "dedup_identical": dedup_identical,
              "batch_offset": batch_offset,
              "band_index": band_index_path,
              "semantic_index": semantic_index_path}
    fs, _ = _hadoop_fs(spark, out_path)
    _, plan_path = _hadoop_fs(spark, f"{out_path}/_backfill/plan.json")
    if fs.exists(plan_path):
        plan = json.loads(_read_small_text(spark, fs, plan_path))
        if plan["params"] != params:
            raise ValueError(
                "backfill_multi_signal: resume with different "
                "parameters than the persisted plan at "
                f"{out_path}/_backfill/plan.json — a mid-backfill "
                "parameter change would file the remaining chunks "
                "under different semantics than the committed ones. "
                "Finish with the original parameters or start a "
                "fresh out_path. Plan params: "
                f"{json.dumps(plan['params'], sort_keys=True)}")
    else:
        n = corpus_df.count()
        n_chunks = max(1, math.ceil(n / chunk_rows))
        probs = [i / n_chunks for i in range(1, n_chunks)]
        bounds = (corpus_df.stat.approxQuantile(id_col, probs, 0.001)
                  if probs else [])
        plan = {"params": params, "n_chunks": n_chunks,
                "bounds": [float(b) for b in bounds]}
        _write_small_text(fs, plan_path,
                          json.dumps(plan, sort_keys=True))

    n_chunks, bounds = plan["n_chunks"], plan["bounds"]
    resumed_from, ran, skipped = 0, 0, 0
    for i in range(n_chunks):
        _, marker = _hadoop_fs(spark, f"{out_path}/_backfill/done_{i}")
        if fs.exists(marker):
            resumed_from = i + 1
            continue
        cond = None
        if i > 0:
            cond = F.col(id_col) > bounds[i - 1]
        if i < n_chunks - 1:
            c2 = F.col(id_col) <= bounds[i]
            cond = c2 if cond is None else (cond & c2)
        chunk = corpus_df.filter(cond) if cond is not None else corpus_df
        bid = batch_offset + i
        survivors, bands, rows, band_surv = \
            multi_signal_batch_against_indexes(
                chunk, band_index_path, semantic_index_path, bid,
                text_col=text_col, id_col=id_col, vec_col=vec_col,
                n_hashes=n_hashes, band_size=band_size, k=k,
                prefix_len=prefix_len, eps=eps,
                dedup_identical=dedup_identical)
        try:
            (survivors.write.mode("overwrite")
             .parquet(f"{out_path}/batch={bid}"))
            append_batch_bands(bands, band_index_path, bid)
            append_semantic_batch(rows, semantic_index_path, bid)
        finally:
            bands.unpersist()
            rows.unpersist()
            band_surv.unpersist()
        if _post_chunk_hook is not None:  # test seam: crash windows
            _post_chunk_hook(i)
        _write_small_text(fs, marker, "done")
        ran += 1
        if band_policy is not None or semantic_policy is not None:
            import warnings as _warnings

            from .dedup import (
                MaintenanceLeaseHeld,
                record_maintenance_skip,
            )

            # each index maintained under its OWN try: a band-lease
            # skip must not also skip semantic maintenance, and each
            # skip must be attributed to the index that was actually
            # starved (round-10 review — an operator paging on
            # maintenance_skips(semantic_index_path) must see
            # semantic contention, not a healthy-band false flag)
            for pol, path, maintain in (
                    (band_policy, band_index_path,
                     maintain_band_index),
                    (semantic_policy, semantic_index_path,
                     maintain_semantic_index)):
                if pol is None:
                    continue
                try:
                    maintain(spark, path, pol)
                except MaintenanceLeaseHeld as e:
                    # contention is transient; the next chunk
                    # re-decides. Counted in the returned report AND
                    # the global dead-letter log (r9 VERDICT #5).
                    skipped += 1
                    record_maintenance_skip(path, "backfill", str(e))
                    _warnings.warn(
                        f"backfill maintenance skipped after chunk "
                        f"{i}: {e}", RuntimeWarning, stacklevel=2)
    return {"chunks": n_chunks, "resumed_from": resumed_from,
            "ran": ran, "maintenance_skips": skipped}


def stream_multi_signal_ingest(
        stream_df: DataFrame, band_index_path: str,
        semantic_index_path: str, out_path: str, checkpoint: str,
        text_col: str = "text", id_col: str = "doc_id",
        vec_col: str = "embedding", n_hashes: int = 8,
        band_size: int = 2, k: int = 3,
        prefix_len: int = _PREFIX_LEN, eps: float = 0.4,
        dedup_identical: bool = True,
        band_handle: BandIndexHandle | None = None,
        semantic_handle: SemanticIndexHandle | None = None,
        band_policy: BandMaintenancePolicy | None = None,
        semantic_policy: MaintenancePolicy | None = None,
        query_name: str = "multi_signal_ingest"):
    """Streaming multi-signal gate: per micro-batch, docs passing
    both the band gate and the semantic gate land under
    ``out_path/batch=N``; the full batch's bands land in the band
    index; the band-survivors' vectors land in the semantic index.
    All three commits run CONCURRENTLY (per-batch-dir overwrites +
    own-batch exclusions — see module docstring). Requires the
    stream frame to carry ``text_col``, ``id_col``, AND ``vec_col``
    (one id namespace across both tiers). Returns the StreamingQuery.

    ``band_handle`` / ``semantic_handle``: open serving handles on
    the two indexes (generation caches, no per-batch tree
    discovery/quantizer reads). Caller-owned, same contract as the
    single-signal wrappers — and the same composition rule: a
    ``semantic_policy`` that requantizes mid-stream FAILS the query
    loudly when ``semantic_handle`` is held (pass
    ``semantic_handle=None`` or a non-requantizing policy instead).
    Band compactions compose transparently with both handles.

    ``band_policy`` / ``semantic_policy``: run the respective
    maintenance loop inside ``foreachBatch`` after the batch's
    commits (band first), sequential with ingest — the one-call
    serve+maintain deployment for both indexes."""
    if checkpoint is None:
        raise ValueError(
            "stream_multi_signal_ingest requires a checkpoint "
            "location; the per-batch overwrite layout is only "
            "exactly-once under a checkpointed batch-id sequence")
    if band_handle is not None and band_handle.path != band_index_path:
        raise ValueError(
            f"band_handle is open on {band_handle.path}, "
            f"not {band_index_path}")
    if (semantic_handle is not None
            and semantic_handle.path != semantic_index_path):
        raise ValueError(
            f"semantic_handle is open on {semantic_handle.path}, "
            f"not {semantic_index_path}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        batch_df.persist()
        try:
            survivors, bands, rows, band_surv = \
                multi_signal_batch_against_indexes(
                batch_df,
                band_handle if band_handle is not None
                else band_index_path,
                semantic_handle if semantic_handle is not None
                else semantic_index_path,
                batch_id, text_col=text_col, id_col=id_col,
                vec_col=vec_col, n_hashes=n_hashes,
                band_size=band_size, k=k, prefix_len=prefix_len,
                eps=eps, dedup_identical=dedup_identical)
            try:
                def _surv() -> None:
                    (survivors.write.mode("overwrite")
                     .parquet(f"{out_path}/batch={batch_id}"))

                def _band() -> None:
                    append_batch_bands(bands, band_index_path,
                                       batch_id)

                def _sem() -> None:
                    append_semantic_batch(rows, semantic_index_path,
                                          batch_id)

                with ThreadPoolExecutor(max_workers=3) as ex:
                    futs = [ex.submit(inheritable_thread_target(f))
                            for f in (_surv, _band, _sem)]
                    for f in futs:
                        f.result()
            finally:
                bands.unpersist()
                rows.unpersist()
                band_surv.unpersist()
        finally:
            batch_df.unpersist()
        import warnings as _warnings

        from .dedup import MaintenanceLeaseHeld, record_maintenance_skip

        if band_policy is not None:
            try:
                maintain_band_index(batch_df.sparkSession,
                                    band_index_path, band_policy)
            except MaintenanceLeaseHeld as e:
                # transient contention with an external maintainer:
                # skip the round, never kill the ingest query (the
                # next batch re-decides — review r9). Countable for
                # alerting via maintenance_skips() (r9 VERDICT #5).
                record_maintenance_skip(band_index_path,
                                        "multi_signal_band", str(e))
                _warnings.warn(
                    f"in-stream band maintenance skipped: {e}",
                    RuntimeWarning, stacklevel=2)
        if semantic_policy is not None:
            try:
                rep = maintain_semantic_index(batch_df.sparkSession,
                                              semantic_index_path,
                                              semantic_policy)
            except MaintenanceLeaseHeld as e:
                record_maintenance_skip(semantic_index_path,
                                        "multi_signal_semantic",
                                        str(e))
                _warnings.warn(
                    f"in-stream semantic maintenance skipped: {e}",
                    RuntimeWarning, stacklevel=2)
                rep = {"action": "noop"}
            if rep["action"] == "requantize" and semantic_handle is not None:
                raise RuntimeError(
                    "stream_multi_signal_ingest: the semantic "
                    "maintenance policy requantized mid-stream while "
                    "a caller-owned semantic_handle is held — the "
                    "handle's cached quantizer is now stale and the "
                    "wrapper will not serve with it or swap it "
                    "behind the caller's back. Restart the stream "
                    "with a fresh handle, or run with "
                    "semantic_handle=None / a non-requantizing "
                    "policy. (Both indexes are consistent: the "
                    "requantize committed and this batch's writes "
                    "landed before it.)")

    return (stream_df.writeStream.foreachBatch(write_batch)
            .queryName(query_name).trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start())

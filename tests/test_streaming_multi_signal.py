"""Composed multi-signal streaming gate (streaming/multi_signal.py):
band-LSH dedup then semantic dedup per micro-batch against both
persistent indexes. Semantics pinned here: the composition equals the
SEQUENTIAL application of the two batch gates — greedy_band_survivors
over the full corpus, then semantic_dedup over the band survivors
(same trained quantizer, arrival order == id order)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from radio_data_pipeline_spark.functions.dedup import (
    greedy_band_survivors,
)
from radio_data_pipeline_spark.functions.similarity import (
    semantic_dedup,
)
from radio_data_pipeline_spark.streaming.multi_signal import (
    multi_signal_batch_against_indexes,
    stream_multi_signal_ingest,
)
from radio_data_pipeline_spark.streaming.semantic import (
    init_semantic_index,
)

pytestmark = pytest.mark.usefixtures("spark")

_EPS = 0.9
_K = 4
_N = 90

_SCHEMA = "doc_id long, text string, embedding array<double>"


def _ms_corpus(spark, n=_N, d=8, seed=3):
    """Docs carrying BOTH signals: text thirds (unique / exact copy /
    near-dup variant — the band-gate fixture) and embeddings drawn
    from four base directions with noise plus exact copies every 7th
    doc (the semantic-gate fixture). The two signals are assigned
    independently, so every tier combination occurs: text-dup only,
    semantic-dup only, both, neither."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(_K, d))
    vecs = []
    rows = []
    for i in range(n):
        if i % 5 == 1:
            text = ("the quick brown fox jumps over the lazy dog "
                    "again and again and again")
        elif i % 5 == 2:
            text = (f"the quick brown fox jumps over the lazy dog "
                    f"again and again variant {i % 7}")
        else:
            # shingle-disjoint from every other doc: every word is
            # unique to doc i, so no band collision is possible
            text = f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f"
        v = base[i % _K] + 0.45 * rng.normal(size=d)
        if i % 7 == 0 and i >= 7:
            v = np.array(vecs[i - 7])
        vecs.append([float(x) for x in v])
        rows.append((i, text, vecs[i]))
    return spark.createDataFrame(rows, _SCHEMA)


def _chunks(df, n_chunks, n=_N):
    step = n // n_chunks
    return [df.filter((F.col("doc_id") >= i * step)
                      & (F.col("doc_id") < (i + 1) * step))
            for i in range(n_chunks)]


def _expected(df):
    """Ground truth from the BATCH functions: band gate over the full
    corpus, semantic gate over the band survivors. Returns
    (band_kept_ids, final_kept_ids)."""
    band_kept = greedy_band_survivors(df)
    band_ids = sorted(r["doc_id"] for r in
                      band_kept.select("doc_id").collect())
    sd = semantic_dedup(band_kept, eps=_EPS, n_clusters=_K,
                        lloyd_rounds=2, id_col="doc_id")
    # semantic_dedup's verdict frame is (vec_id, cluster, is_kept)
    # whatever the input id_col was named
    final = sorted(r["vec_id"] for r in
                   sd.filter("is_kept").select("vec_id").collect())
    return band_ids, final


def _init_indexes(spark, df, tmp_path):
    band_index = str(tmp_path / "band_index")
    sem_index = str(tmp_path / "sem_index")
    # quantizer trained on the band survivors — the semantic gate's
    # actual input population (and what batch semantic_dedup trains
    # on for the equivalence)
    init_semantic_index(greedy_band_survivors(df), sem_index,
                        n_clusters=_K, lloyd_rounds=2,
                        id_col="doc_id")
    return band_index, sem_index


@pytest.mark.parametrize("seed,n_chunks", [(3, 2), (3, 3), (11, 3),
                                           (29, 2)])
def test_kernel_composition_matches_sequential_batch_gates(
        spark, tmp_path, seed, n_chunks):
    """Chunking the corpus through the composed kernel in id order
    reproduces exactly greedy_band_survivors -> semantic_dedup of the
    full corpus, across corpus draws AND chunk granularities (the
    equivalence must not depend on where batch boundaries fall or
    which pairs happen to sit near the eps boundary); each index
    accumulates its tier's population (band: ALL processed docs;
    semantic: band survivors only)."""
    df = _ms_corpus(spark, seed=seed)
    band_ids, expected = _expected(df)
    # nontrivial verdicts at BOTH tiers
    assert 0 < len(band_ids) < _N
    assert 0 < len(expected) < len(band_ids)

    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    from radio_data_pipeline_spark.streaming.dedup import (
        append_batch_bands)
    from radio_data_pipeline_spark.streaming.semantic import (
        append_semantic_batch)

    got = []
    for bid, chunk in enumerate(_chunks(df, n_chunks)):
        survivors, bands, rows, band_surv = \
            multi_signal_batch_against_indexes(
                chunk, band_index, sem_index, bid, eps=_EPS)
        got.extend(r["doc_id"] for r in
                   survivors.select("doc_id").collect())
        append_batch_bands(bands, band_index, bid)
        append_semantic_batch(rows, sem_index, bid)
        bands.unpersist()
        rows.unpersist()
        band_surv.unpersist()
    assert sorted(got) == expected

    # tiered index content: band index saw every processed doc,
    # semantic index exactly the band-admitted ones
    assert (spark.read.parquet(band_index)
            .select("id").distinct().count() == _N)
    sem_ids = sorted(r["id"] for r in spark.read.parquet(sem_index)
                     .select("id").distinct().collect())
    assert sem_ids == band_ids


def test_stream_multi_signal_end_to_end(spark, tmp_path):
    """Real Structured Streaming run in two phases (availableNow +
    checkpoint = deterministic batch boundaries): survivors across
    phases equal the sequential batch composition; both indexes carry
    one ingest_batch dir per phase."""
    df = _ms_corpus(spark)
    _, expected = _expected(df)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    cp = str(tmp_path / "cp")

    def run_phase(lo, hi, fname):
        (df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(str(src / fname)))
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src / "*"))
        q = stream_multi_signal_ingest(stream, band_index, sem_index,
                                       out, checkpoint=cp, eps=_EPS)
        q.awaitTermination()

    run_phase(0, 45, "f1")
    run_phase(45, _N, "f2")

    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out).select("doc_id").collect())
    assert got == expected
    for idx in (band_index, sem_index):
        assert (spark.read.parquet(idx)
                .select("ingest_batch").distinct().count() == 2)


def test_kernel_replay_is_idempotent(spark, tmp_path):
    """Crash-replay through the COMPOSITION: a failed attempt left
    batch 0's rows in BOTH indexes; re-running the same batch id
    reproduces the identical survivor set (each kernel's own-batch
    exclusion holds through the chaining — the semantic stage sees
    the identical band-survivor frame on replay)."""
    df = _ms_corpus(spark)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    from radio_data_pipeline_spark.streaming.dedup import (
        append_batch_bands)
    from radio_data_pipeline_spark.streaming.semantic import (
        append_semantic_batch)

    def run(bid):
        survivors, bands, rows, band_surv = \
            multi_signal_batch_against_indexes(
                df, band_index, sem_index, bid, eps=_EPS)
        ids = sorted(r["doc_id"] for r in
                     survivors.select("doc_id").collect())
        append_batch_bands(bands, band_index, bid)
        append_semantic_batch(rows, sem_index, bid)
        bands.unpersist()
        rows.unpersist()
        band_surv.unpersist()
        return ids

    first = run(0)   # "crash" after both index appends, before
    replay = run(0)  # the checkpoint commit; then replay
    assert replay == first
    # overwrite-not-append: no duplicate index rows from the replay
    assert (spark.read.parquet(band_index)
            .select("id").distinct().count() == _N)
    assert (spark.read.parquet(sem_index).groupBy("id").count()
            .filter("count > 1").count() == 0)


def test_stream_with_handles_and_band_maintenance(spark, tmp_path):
    """Serving configuration: both caller-owned handles open plus a
    band policy folding every batch — verdicts unchanged, the band
    index ends folded (a generation dir exists), and the handles
    survive the mid-stream folds."""
    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, ensure_band_meta, open_band_index)
    from radio_data_pipeline_spark.streaming.semantic import (
        open_semantic_index)

    df = _ms_corpus(spark)
    _, expected = _expected(df)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    cp = str(tmp_path / "cp")

    # the handle needs the layout meta, written on first kernel use —
    # pin it up front (same params the wrapper defaults to)
    ensure_band_meta(spark, band_index, 2, 8, 2, 3)
    bh = open_band_index(spark, band_index)
    sh = open_semantic_index(spark, sem_index)
    try:
        for phase, (lo, hi) in enumerate([(0, 30), (30, 60),
                                          (60, _N)]):
            (df.filter((F.col("doc_id") >= lo)
                       & (F.col("doc_id") < hi))
             .coalesce(1).write.mode("overwrite")
             .parquet(str(src / f"f{phase}")))
            stream = (spark.readStream.schema(_SCHEMA)
                      .parquet(str(src / "*")))
            q = stream_multi_signal_ingest(
                stream, band_index, sem_index, out, checkpoint=cp,
                eps=_EPS, band_handle=bh, semantic_handle=sh,
                band_policy=BandMaintenancePolicy(
                    compact_after_batches=1))
            q.awaitTermination()
    finally:
        bh.close()
        sh.close()

    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out).select("doc_id").collect())
    assert got == expected
    from radio_data_pipeline_spark.streaming.dedup import (
        band_index_signals)
    sig = band_index_signals(spark, band_index)
    assert sig["generations"] >= 1  # the policy folds actually ran


def test_semantic_requantize_with_held_handle_fails_loud(
        spark, tmp_path):
    """The composed wrapper inherits the single-gate rule: a
    caller-owned semantic handle + a policy that requantizes
    mid-stream fails the query with the documented error."""
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException)

    from radio_data_pipeline_spark.streaming.semantic import (
        MaintenancePolicy, open_semantic_index)

    df = _ms_corpus(spark)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    cp = str(tmp_path / "cp")
    pol = MaintenancePolicy(compact_after_batches=10**9,
                            requantize_over_occupancy=1.0,
                            target_cluster_rows=4,
                            min_rows_for_requantize=1,
                            lloyd_rounds=2)

    df.coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    sh = open_semantic_index(spark, sem_index)
    try:
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src / "*"))
        q = stream_multi_signal_ingest(
            stream, band_index, sem_index, out, checkpoint=cp,
            eps=_EPS, semantic_handle=sh, semantic_policy=pol)
        with pytest.raises(StreamingQueryException,
                           match="requantized mid-stream"):
            q.awaitTermination()
    finally:
        sh.close()


def test_backfill_fresh_run_matches_reference(spark, tmp_path):
    """backfill_multi_signal over the corpus in ~3 chunks equals the
    sequential batch composition; markers + plan persisted; the
    semantic index holds exactly the band-admitted ids."""
    from radio_data_pipeline_spark.streaming.multi_signal import (
        backfill_multi_signal)

    df = _ms_corpus(spark)
    band_ids, expected = _expected(df)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    out = str(tmp_path / "out")

    rep = backfill_multi_signal(df, band_index, sem_index, out,
                                chunk_rows=30, eps=_EPS)
    assert rep == {"chunks": 3, "resumed_from": 0, "ran": 3,
                   "maintenance_skips": 0}
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(f"{out}/batch=*")
                 .select("doc_id").collect())
    assert got == expected
    sem_ids = sorted(r["id"] for r in spark.read.parquet(sem_index)
                     .select("id").distinct().collect())
    assert sem_ids == band_ids


def test_backfill_crash_resume_is_exact(spark, tmp_path):
    """Crash after chunk 1's commits but BEFORE its done marker:
    resume replays exactly chunk 1 and the rest, the survivor set
    equals the uncrashed reference, and neither index holds
    duplicate rows. A resume with changed parameters is rejected
    against the persisted plan."""
    from radio_data_pipeline_spark.streaming.multi_signal import (
        backfill_multi_signal)

    df = _ms_corpus(spark)
    _, expected = _expected(df)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    out = str(tmp_path / "out")

    class Boom(RuntimeError):
        pass

    def crash_after_1(i):
        if i == 1:
            raise Boom()

    with pytest.raises(Boom):
        backfill_multi_signal(df, band_index, sem_index, out,
                              chunk_rows=30, eps=_EPS,
                              _post_chunk_hook=crash_after_1)

    # changed params refused against the plan
    with pytest.raises(ValueError, match="different "):
        backfill_multi_signal(df, band_index, sem_index, out,
                              chunk_rows=30, eps=0.5)

    rep = backfill_multi_signal(df, band_index, sem_index, out,
                                chunk_rows=30, eps=_EPS)
    assert rep["chunks"] == 3 and rep["resumed_from"] == 1
    assert rep["ran"] == 2  # chunk 1 replayed, chunk 2 fresh
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(f"{out}/batch=*")
                 .select("doc_id").collect())
    assert got == expected
    assert (spark.read.parquet(sem_index).groupBy("id").count()
            .filter("count > 1").count() == 0)
    bands_per_doc = (spark.read.parquet(band_index)
                     .groupBy("id", "band_id").count()
                     .filter("count > 1").count())
    assert bands_per_doc == 0


def test_wrapper_validates_arguments(spark, tmp_path):
    """Checkpoint is mandatory; a handle open on a different path is
    rejected before the stream starts."""
    from radio_data_pipeline_spark.streaming.semantic import (
        open_semantic_index)

    df = _ms_corpus(spark, n=12)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "src0"))
    stream = spark.readStream.schema(_SCHEMA).parquet(
        str(tmp_path / "src0"))
    with pytest.raises(ValueError, match="checkpoint"):
        stream_multi_signal_ingest(stream, band_index, sem_index,
                                   str(tmp_path / "out"),
                                   checkpoint=None)
    sh = open_semantic_index(spark, sem_index)
    try:
        with pytest.raises(ValueError, match="semantic_handle"):
            stream_multi_signal_ingest(
                stream, band_index, str(tmp_path / "other_sem"),
                str(tmp_path / "out"),
                checkpoint=str(tmp_path / "cp"),
                semantic_handle=sh)
    finally:
        sh.close()


def test_kernel_raise_unpersists_band_frames(spark, tmp_path,
                                             monkeypatch):
    """If the SEMANTIC stage raises mid-kernel (StaleQuantizerError,
    quantizer read failure), the already-persisted `bands` and
    `band_survivors` frames must not leak into the shared session —
    the callers' unpersist-finally blocks wrap only the commits, not
    the kernel call (r9 ADVICE)."""
    import radio_data_pipeline_spark.streaming.multi_signal as ms

    df = _ms_corpus(spark, n=30)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)

    def boom(*a, **kw):
        raise RuntimeError("synthetic semantic-stage failure")

    monkeypatch.setattr(ms, "semantic_dedup_batch_against_index", boom)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(RuntimeError, match="synthetic semantic"):
        multi_signal_batch_against_indexes(df, band_index, sem_index, 0)
    assert jsc.getPersistentRDDs().size() == before


def test_backfill_attributes_skips_to_the_starved_index(
        spark, tmp_path):
    """A held SEMANTIC lease during backfill maintenance must be
    counted against the semantic index (and band maintenance must
    still run) — not misattributed to the band index (round-10
    review: an operator paging on
    maintenance_skips(semantic_index_path) must see the starvation)."""
    import json as _json
    import os

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, maintenance_skips,
        reset_maintenance_skips)
    from radio_data_pipeline_spark.streaming.multi_signal import (
        backfill_multi_signal)
    from radio_data_pipeline_spark.streaming.semantic import (
        MaintenancePolicy)

    reset_maintenance_skips()
    df = _ms_corpus(spark, n=30)
    band_index, sem_index = _init_indexes(spark, df, tmp_path)
    os.makedirs(sem_index, exist_ok=True)
    with open(f"{sem_index}/_maintenance.lease", "w") as f:
        f.write(_json.dumps({"op": "external", "lease_id": "x",
                             "acquired_at": 0}))

    rep = backfill_multi_signal(
        df, band_index, sem_index, str(tmp_path / "out"),
        chunk_rows=15, eps=_EPS,
        band_policy=BandMaintenancePolicy(compact_after_batches=1),
        semantic_policy=MaintenancePolicy(compact_after_batches=1))
    assert rep["maintenance_skips"] >= 1
    # attributed to the SEMANTIC index; the band index ran its
    # maintenance rounds unskipped
    assert maintenance_skips(sem_index)["total"] == \
        rep["maintenance_skips"]
    assert maintenance_skips(band_index)["total"] == 0
    # band maintenance actually ran: the band index has generations
    from radio_data_pipeline_spark.streaming.dedup import (
        band_index_signals)
    assert band_index_signals(spark, band_index)["generations"] >= 1
    reset_maintenance_skips()

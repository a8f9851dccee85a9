"""Incremental near-dup ingest (streaming/dedup.py): the persisted
band index accumulates, per-batch probes prune by (band_id,
bh_prefix), and the stream's survivor set equals the batch
greedy_band_survivors of the full corpus under id-ordered arrival."""

import pyspark.sql.functions as F
import pytest

from radio_data_pipeline_spark.functions.dedup import (
    greedy_band_survivors,
)
from radio_data_pipeline_spark.streaming.dedup import (
    append_batch_bands,
    compact_band_index,
    dedup_batch_against_index,
    stream_dedup_ingest,
)

pytestmark = pytest.mark.usefixtures("spark")


def _corpus(spark, n=120):
    # thirds: unique docs, exact copies of earlier docs, and a
    # cross-batch near-dup chain (same text with one word swapped)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            text = f"alpha bravo charlie delta echo foxtrot golf {i}"
        elif i % 3 == 1:
            text = ("the quick brown fox jumps over the lazy dog "
                    "again and again and again")
        else:
            text = (f"the quick brown fox jumps over the lazy dog "
                    f"again and again variant {i % 7}")
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(df, n_chunks, n):
    step = n // n_chunks
    return [df.filter((F.col("doc_id") >= i * step)
                      & (F.col("doc_id") < (i + 1) * step))
            for i in range(n_chunks)]


def test_incremental_kernel_matches_batch_greedy(spark, tmp_path):
    """Chunking the corpus through the kernel in id order reproduces
    the batch greedy_band_survivors set exactly."""
    df = _corpus(spark)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())

    index = str(tmp_path / "band_index")
    got = []
    for bid, chunk in enumerate(_chunks(df, 3, 120)):
        survivors, bands = dedup_batch_against_index(chunk, index, bid)
        got.extend(r["doc_id"] for r in
                   survivors.select("doc_id").collect())
        append_batch_bands(bands, index, bid)
        bands.unpersist()
    assert sorted(got) == expected
    # the index accumulated every processed doc's bands, not just
    # survivors' — a later copy of a DROPPED doc must still match
    idx = spark.read.parquet(index)
    assert idx.select("id").distinct().count() > len(expected) - 1
    assert set(idx.columns) >= {"id", "band_id", "band_hash",
                                "bh_prefix", "ingest_batch"}


def test_kernel_drops_duplicate_of_already_dropped_doc(spark, tmp_path):
    """A doc near-duplicating an already-DROPPED doc is still dropped:
    bands of dropped docs are indexed too."""
    dup = "zulu yankee xray whiskee victor uniform tango sierra"
    b0 = spark.createDataFrame(
        [(0, dup), (1, dup)], "doc_id long, text string")
    index = str(tmp_path / "idx")
    s0, bands0 = dedup_batch_against_index(b0, index, 0)
    assert [r["doc_id"] for r in s0.collect()] == [0]  # 1 dropped
    append_batch_bands(bands0, index, 0)
    bands0.unpersist()

    # doc 2 duplicates doc 1 (the dropped one) == duplicates doc 0 here;
    # the real chain case: doc text equal to the DROPPED doc's text
    b1 = spark.createDataFrame([(2, dup)], "doc_id long, text string")
    s1, bands1 = dedup_batch_against_index(b1, index, 1)
    assert s1.count() == 0
    bands1.unpersist()


def test_replay_after_compaction_keeps_verdicts(spark, tmp_path):
    """Crash after the index append but BEFORE the checkpoint commit,
    then compaction while the stream is down, then replay of the same
    batch id: the failed attempt's rows now live in a negative
    generation, so a partition-value exclusion alone would stop
    seeing them and every replayed doc would self-match and drop.
    The src_batch data column keeps the exclusion working."""
    df = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f")
         for i in range(10)], "doc_id long, text string")
    index = str(tmp_path / "idx")
    s0, bands0 = dedup_batch_against_index(df, index, 0)
    n_first = s0.count()
    append_batch_bands(bands0, index, 0)  # crash before checkpoint
    bands0.unpersist()
    assert compact_band_index(spark, index) == 1  # maintenance run
    s0b, bands0b = dedup_batch_against_index(df, index, 0)
    assert s0b.count() == n_first == 10
    bands0b.unpersist()


def test_kernel_replay_excludes_own_batch(spark, tmp_path):
    """Crash-replay: a failed attempt left the batch's OWN bands in
    the index; re-running the same batch id must not match against
    them (else every replayed doc self-collides and is dropped)."""
    # no two docs share ANY shingle -> no true collisions possible
    df = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f")
         for i in range(10)], "doc_id long, text string")
    index = str(tmp_path / "idx")
    s0, bands0 = dedup_batch_against_index(df, index, 0)
    n_first = s0.count()
    # simulate: index write happened, then crash before checkpoint
    append_batch_bands(bands0, index, 0)
    bands0.unpersist()
    # replay of batch 0: own partition must be invisible to the probe
    s0b, bands0b = dedup_batch_against_index(df, index, 0)
    assert s0b.count() == n_first == 10
    append_batch_bands(bands0b, index, 0)  # overwrite, not append
    bands0b.unpersist()
    assert spark.read.parquet(index).count() == bands0b.count()


def test_stream_dedup_ingest_end_to_end(spark, tmp_path):
    """Real Structured Streaming run in two phases (availableNow +
    checkpoint = deterministic batch boundaries): survivors across
    phases equal the batch greedy set of everything ingested."""
    df = _corpus(spark)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    index = str(tmp_path / "band_index")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, text string"

    def run_phase(lo, hi, fname):
        (df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(str(src / fname)))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = stream_dedup_ingest(stream, index, out, checkpoint=cp)
        q.awaitTermination()

    run_phase(0, 60, "f1")
    run_phase(60, 120, "f2")

    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out).select("doc_id").collect())
    assert got == expected
    # index partition layout carries the probe-pruning keys
    batches = spark.read.parquet(index).select(
        "ingest_batch").distinct().count()
    assert batches == 2


def test_prefix_partition_values_defeat_numeric_inference(spark, tmp_path):
    """Regression (r5 advice): hive partition-type inference parses
    pure-hex dir values like '07'/'3f'/'10' as DOUBLES when every dir
    in the dataset parses (likely for a small early index), silently
    breaking the string isin() probe and permanently colliding
    prefixes under compaction ('3f' -> 3.0 == '03' -> 3.0). The
    premise, pinned so a Spark behavior change surfaces here:"""
    hazard = str(tmp_path / "hazard")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    for pfx in ["07", "3f", "10"]:
        df.write.mode("overwrite").parquet(f"{hazard}/bh_prefix={pfx}")
    inferred = spark.read.parquet(hazard).schema["bh_prefix"].dataType
    assert inferred.simpleString() != "string"  # the trap is real

    # ... and the fix: every bh_prefix starts with a letter, so the
    # index ALWAYS reads back as string, however few dirs exist
    index = str(tmp_path / "idx")
    b0 = spark.createDataFrame(
        [(0, "mike november oscar papa quebec romeo sierra")],
        "doc_id long, text string")
    _, bands = dedup_batch_against_index(b0, index, 0)
    vals = [r["bh_prefix"] for r in
            bands.select("bh_prefix").distinct().collect()]
    import re
    assert vals and all(re.fullmatch(r"p[0-9a-f]{2}", v) for v in vals)
    append_batch_bands(bands, index, 0)
    bands.unpersist()
    back = spark.read.parquet(index)
    assert back.schema["bh_prefix"].dataType.simpleString() == "string"
    # cross-batch probe still matches through the persisted layout
    b1 = spark.createDataFrame(
        [(9, "mike november oscar papa quebec romeo sierra")],
        "doc_id long, text string")
    s1, bands1 = dedup_batch_against_index(b1, index, 1)
    assert s1.count() == 0  # duplicate detected via the index
    bands1.unpersist()


def test_prefix_len_widens_layout_and_still_matches(spark, tmp_path):
    """prefix_len=3 (the §16 widening knob, 4,096 dirs/band) keeps
    exact cross-batch matching as long as every probe/append uses the
    index's own width."""
    import re

    dup = "papa quebec romeo sierra tango uniform victor whiskey"
    index = str(tmp_path / "idx3")
    b0 = spark.createDataFrame([(0, dup)], "doc_id long, text string")
    s0, bands0 = dedup_batch_against_index(b0, index, 0, prefix_len=3)
    vals = [r["bh_prefix"] for r in
            bands0.select("bh_prefix").distinct().collect()]
    assert vals and all(re.fullmatch(r"p[0-9a-f]{3}", v) for v in vals)
    append_batch_bands(bands0, index, 0)
    bands0.unpersist()
    b1 = spark.createDataFrame([(7, dup)], "doc_id long, text string")
    s1, bands1 = dedup_batch_against_index(b1, index, 1, prefix_len=3)
    assert s1.count() == 0  # matched through the wide layout
    bands1.unpersist()
    # compaction is width-agnostic (reads the layout it finds)
    append_batch_bands(bands1, index, 1)
    assert compact_band_index(spark, index) == 2


def test_compaction_skips_source_overwritten_mid_fold(spark, tmp_path):
    """Writer-race guard (r5 verdict #5): a batch directory overwritten
    AFTER the compactor snapshotted its sources (crash-replay of that
    batch) must NOT be deleted — its fresh rows survive for the next
    compaction, and only unchanged sources are removed."""
    import glob as _glob

    df = _corpus(spark)
    index = str(tmp_path / "idx")
    chunks = _chunks(df, 3, 120)
    for bid, chunk in enumerate(chunks[:2]):
        _, bands = dedup_batch_against_index(chunk, index, bid)
        append_batch_bands(bands, index, bid)
        bands.unpersist()

    extra = "hotel india juliett kilo lima mike november oscar"

    def replay_batch_1_with_extra_doc():
        b1 = chunks[1].union(spark.createDataFrame(
            [(500, extra)], "doc_id long, text string"))
        _, bands = dedup_batch_against_index(b1, index, 1)
        append_batch_bands(bands, index, 1)  # overwrites its own dir
        bands.unpersist()

    n = compact_band_index(spark, index,
                           _post_fold_hook=replay_batch_1_with_extra_doc)
    assert n == 1  # batch 0 deleted; batch 1 changed -> kept
    gens = sorted(_glob.glob(f"{index}/ingest_batch=*"))
    assert {g.rsplit("/", 1)[1] for g in gens} == {"ingest_batch=-1",
                                                   "ingest_batch=1"}
    # the replayed batch's fresh rows survived: a later duplicate of
    # the extra doc still matches the index
    b2 = spark.createDataFrame([(600, extra)], "doc_id long, text string")
    s2, bands2 = dedup_batch_against_index(b2, index, 2)
    assert s2.count() == 0
    bands2.unpersist()
    # next compaction folds survivor + previous generation into a NEW
    # strictly-older generation (never overwriting one it reads) —
    # batch 0's rows, present only in gen -1, must survive the fold
    before = set(map(tuple, spark.read.parquet(index)
                     .select("id", "band_id", "band_hash").collect()))
    assert compact_band_index(spark, index) == 2
    gens = _glob.glob(f"{index}/ingest_batch=*")
    assert [g.rsplit("/", 1)[1] for g in gens] == ["ingest_batch=-2"]
    after = set(map(tuple, spark.read.parquet(index)
                    .select("id", "band_id", "band_hash").collect()))
    assert after == before


def test_compaction_preserves_verdicts_and_bounds_dirs(spark, tmp_path):
    """compact_band_index folds per-batch generations into one:
    identical band multiset, identical verdicts for the next batch,
    fewer directories; and a second compaction is a no-op. Also pins
    the crash-duplication argument: verdicts are unchanged even with
    bands duplicated across old and new generations (matching is
    existential)."""
    import glob as _glob

    df = _corpus(spark)
    index = str(tmp_path / "idx")
    for bid, chunk in enumerate(_chunks(df, 3, 120)[:2]):
        _, bands = dedup_batch_against_index(chunk, index, bid)
        append_batch_bands(bands, index, bid)
        bands.unpersist()

    before = sorted(map(tuple, spark.read.parquet(index)
                        .select("id", "band_id", "band_hash").collect()))
    last = _chunks(df, 3, 120)[2]

    def verdict():
        s, b = dedup_batch_against_index(last, index, 2)
        got = sorted(r["doc_id"] for r in s.select("doc_id").collect())
        b.unpersist()
        return got

    v_before = verdict()

    # crash-window duplication: copy of gen written, sources not yet
    # deleted == bands present twice; verdicts must not change
    folded_df = spark.read.parquet(index) \
        .select("id", "band_id", "band_hash", "bh_prefix", "src_batch")
    (folded_df.write.mode("overwrite").partitionBy("band_id", "bh_prefix")
     .parquet(f"{index}/ingest_batch=-1"))
    assert verdict() == v_before

    # fold consumes batches 0, 1 AND the crash-leftover generation;
    # the distinct squeezes the duplicated rows back out
    n = compact_band_index(spark, index)
    assert n == 3
    after = sorted(map(tuple, spark.read.parquet(index)
                       .select("id", "band_id", "band_hash").collect()))
    assert after == before
    gens = _glob.glob(f"{index}/ingest_batch=*")
    assert len(gens) == 1 and gens[0].endswith("ingest_batch=-2")
    assert verdict() == v_before
    assert compact_band_index(spark, index) == 0
    # nonnegative generation is a live batch id — refused
    with pytest.raises(ValueError):
        compact_band_index(spark, index, generation=3)


def test_band_meta_persisted_and_validated(spark, tmp_path):
    """The layout params are persisted as _meta.json at first kernel
    use and every later probe/append is validated against them
    (ADVICE r6 medium): a mismatched prefix_len or hash param raises
    loudly instead of silently admitting duplicates."""
    import json as _json

    from radio_data_pipeline_spark.streaming.dedup import (
        _BAND_META_CACHE, ensure_band_meta)

    df = _corpus(spark, 30)
    index = str(tmp_path / "meta_idx")
    _, bands = dedup_batch_against_index(df, index, 0, prefix_len=3)
    append_batch_bands(bands, index, 0)
    bands.unpersist()
    meta = _json.loads(open(f"{index}/_meta.json").read())
    assert meta["prefix_len"] == 3 and meta["format_version"] == 1
    assert meta["n_hashes"] == 8 and meta["band_size"] == 2

    # probe with the default prefix_len (2) against the 3-wide layout
    with pytest.raises(ValueError, match="layout mismatch"):
        dedup_batch_against_index(df, index, 1)
    # a mismatched hash parameter is just as fatal
    with pytest.raises(ValueError, match="layout mismatch"):
        dedup_batch_against_index(df, index, 1, prefix_len=3,
                                  n_hashes=16)
    # matching params keep working (cache hit path)
    s, b = dedup_batch_against_index(df, index, 1, prefix_len=3)
    assert s.count() == 0  # replayed corpus: all dropped
    b.unpersist()

    # validation also holds cold (fresh process would have no cache)
    _BAND_META_CACHE.pop(index, None)
    with pytest.raises(ValueError, match="layout mismatch"):
        ensure_band_meta(spark, index, 2, 8, 2, 3)


def test_band_meta_refuses_legacy_index(spark, tmp_path):
    """An index holding batches but no _meta.json predates the
    versioned layout and is refused, not silently mis-probed."""
    import os

    df = _corpus(spark, 30)
    index = str(tmp_path / "legacy_idx")
    _, bands = dedup_batch_against_index(df, index, 0)
    append_batch_bands(bands, index, 0)
    bands.unpersist()
    os.remove(f"{index}/_meta.json")
    from radio_data_pipeline_spark.streaming.dedup import (
        _BAND_META_CACHE)
    _BAND_META_CACHE.pop(index, None)
    with pytest.raises(ValueError, match="predates the versioned"):
        dedup_batch_against_index(df, index, 1)
    # append against a meta-less index is refused too
    b2 = df.limit(5)
    _, bands2 = dedup_batch_against_index(
        b2, str(tmp_path / "other_idx"), 0)
    with pytest.raises(ValueError, match="no _meta.json"):
        append_batch_bands(bands2, index, 1)
    bands2.unpersist()


def test_band_append_rejects_mismatched_prefix_width(spark, tmp_path):
    """append_batch_bands asserts bh_prefix width in-plan against the
    persisted prefix_len — a bands frame built with another width
    fails the write loudly (zero extra jobs on the matching path)."""
    from pyspark.errors.exceptions.captured import (
        SparkRuntimeException)

    df = _corpus(spark, 30)
    index = str(tmp_path / "width_idx")
    _, bands = dedup_batch_against_index(df, index, 0)  # prefix_len=2
    append_batch_bands(bands, index, 0)

    from radio_data_pipeline_spark.streaming.dedup import (
        _prefixed_bands)
    wide = _prefixed_bands(df, "text", "doc_id", 8, 2, 3,
                           prefix_len=3)
    with pytest.raises(SparkRuntimeException, match="layout mismatch"):
        append_batch_bands(wide, index, 1)
    bands.unpersist()


def test_null_src_batch_rows_still_witness(spark, tmp_path):
    """Defense in depth (ADVICE r6 low): index rows with NULL
    src_batch must stay visible to probes — plain != would NULL them
    out and stop them witnessing duplicates."""
    df = _corpus(spark, 30)
    index = str(tmp_path / "null_idx")
    _, bands = dedup_batch_against_index(df, index, 0)
    append_batch_bands(bands, index, 0)
    bands.unpersist()
    # corrupt the index: null out src_batch in place
    rows = (spark.read.parquet(index)
            .withColumn("src_batch",
                        F.lit(None).cast("int"))
            .select("id", "band_id", "band_hash", "bh_prefix",
                    "src_batch"))
    rows.write.mode("overwrite").partitionBy("band_id", "bh_prefix") \
        .parquet(f"{index}/ingest_batch=-1")
    import shutil
    shutil.rmtree(f"{index}/ingest_batch=0")
    # replaying the same corpus as batch 1 must drop EVERY doc — the
    # NULL-src rows are the only witnesses
    s, b = dedup_batch_against_index(df, index, 1)
    assert s.count() == 0
    b.unpersist()


def test_maintenance_lease_excludes_concurrent_ops(spark, tmp_path):
    """r6 VERDICT #7: two maintenance ops can no longer START
    concurrently — a second op fails fast while the first holds the
    lease (observed MID-op via the _post_fold_hook seam), a crashed
    op's stale lease is broken after the TTL, and a fresh foreign
    lease blocks."""
    import os
    import time

    df = _corpus(spark, 60)
    index = str(tmp_path / "lease_idx")
    for bid, chunk in enumerate(_chunks(df, 2, 60)):
        _, bands = dedup_batch_against_index(chunk, index, bid)
        append_batch_bands(bands, index, bid)
        bands.unpersist()

    # a second compaction STARTED while the first is mid-fold raises
    hits = {}

    def second_op():
        try:
            compact_band_index(spark, index)
        except RuntimeError as e:
            hits["err"] = str(e)

    assert compact_band_index(spark, index,
                              _post_fold_hook=second_op) == 2
    assert "lease" in hits["err"]
    # lease released after the op: a fresh compaction is a no-op run
    assert not os.path.exists(f"{index}/_maintenance.lease")
    assert compact_band_index(spark, index) == 0

    # fresh foreign lease (simulated crash 10s ago): fail fast
    lease = f"{index}/_maintenance.lease"
    with open(lease, "w") as f:
        f.write('{"op": "requantize"}')
    with pytest.raises(RuntimeError, match="lease"):
        compact_band_index(spark, index)
    # stale lease (mtime beyond ttl): broken and the op proceeds
    old = time.time() - 7200
    os.utime(lease, (old, old))
    _, bands = dedup_batch_against_index(df.limit(5), index, 7)
    append_batch_bands(bands, index, 7)
    bands.unpersist()
    assert compact_band_index(spark, index) == 2
    assert not os.path.exists(lease)


def test_maintenance_lease_break_and_refresh(spark, tmp_path):
    """Round-7 hardening of the lease protocol: (a) breaking a stale
    lease is by RENAME, so a racer that also judged the same lease
    stale cannot delete the winner's FRESH lease (the TOCTOU the
    unconditional-delete break had) — observable contract: while the
    winner holds its post-break lease, a second op fails fast; (b)
    the yielded refresh() touches the lease mtime so a LIVE op longer
    than the TTL keeps its exclusion."""
    import os
    import time

    from radio_data_pipeline_spark.streaming.dedup import (
        maintenance_lease)

    index = str(tmp_path / "idx")
    os.makedirs(index)
    lease = f"{index}/_maintenance.lease"
    with open(lease, "w") as f:
        f.write('{"op": "crashed"}')
    old = time.time() - 7200
    os.utime(lease, (old, old))

    with maintenance_lease(spark, index, "winner") as refresh:
        # the stale lease was broken by rename: no tombstone remains
        assert not [p for p in os.listdir(index) if "broken" in p]
        # a racer that ALSO saw the stale lease must not evict the
        # winner: the fresh lease blocks it
        with pytest.raises(RuntimeError, match="held"):
            with maintenance_lease(spark, index, "loser"):
                pass
        # refresh() advances the mtime -> a live op never goes stale
        os.utime(lease, (old, old))  # simulate having aged past TTL
        refresh()
        assert time.time() - os.path.getmtime(lease) < 60
    assert not os.path.exists(lease)


def test_lease_release_spares_successors_fresh_lease(spark, tmp_path):
    """r7 ADVICE: an op that ages past the TTL without refreshing can
    be legitimately usurped — its exit must then leave the
    successor's FRESH lease alone (the old unconditional delete
    reopened the concurrent-maintenance window the rename-break
    closed), and delete only a lease still carrying its own id."""
    import json as _json
    import os

    from radio_data_pipeline_spark.streaming.dedup import (
        maintenance_lease)

    import time

    index = str(tmp_path / "idx")
    os.makedirs(index)
    lease = f"{index}/_maintenance.lease"
    # manual enter/exit: the zombie must EXIT while the successor's
    # fresh lease is live, which nests the wrong way for `with`
    zombie = maintenance_lease(spark, index, "zombie")
    zombie.__enter__()
    old = time.time() - 7200
    os.utime(lease, (old, old))  # zombie ages past the TTL
    successor = maintenance_lease(spark, index, "successor")
    successor.__enter__()  # breaks the stale lease, acquires its own
    try:
        with pytest.warns(RuntimeWarning, match="usurped"):
            zombie.__exit__(None, None, None)
        assert os.path.exists(lease)  # fresh lease survived
        got = _json.loads(open(lease).read())
        assert got["op"] == "successor"
    finally:
        successor.__exit__(None, None, None)
    assert not os.path.exists(lease)  # successor's own exit releases

    # and the normal path still releases: same-id lease is deleted
    index2 = str(tmp_path / "idx2")
    os.makedirs(index2)
    with maintenance_lease(spark, index2, "normal"):
        pass
    assert not os.path.exists(f"{index2}/_maintenance.lease")


def test_band_meta_cache_invalidated_on_index_rebuild(spark, tmp_path):
    """r7 ADVICE: delete-and-rebuild at the same path within one
    driver process must write fresh _meta.json for the new index —
    a stale _BAND_META_CACHE hit would leave the rebuild meta-less
    (later refused as 'legacy') or spuriously reject new params
    against the deleted index's meta."""
    import json as _json
    import os
    import shutil

    df = _corpus(spark, 20)
    index = str(tmp_path / "rebuild_idx")
    _, bands = dedup_batch_against_index(df, index, 0, prefix_len=3)
    append_batch_bands(bands, index, 0)
    bands.unpersist()
    assert os.path.exists(f"{index}/_meta.json")

    shutil.rmtree(index)  # the mismatch error's own remediation

    # rebuild with DIFFERENT params: a stale cache entry would raise
    # 'layout mismatch' against the DELETED index's meta; the fresh
    # index must instead persist the new params
    _, bands2 = dedup_batch_against_index(df, index, 0, prefix_len=2)
    append_batch_bands(bands2, index, 0)
    bands2.unpersist()
    meta = _json.loads(open(f"{index}/_meta.json").read())
    assert meta["prefix_len"] == 2


def test_lease_release_rename_first_survives_break_window(spark, tmp_path):
    """r8 ADVICE/VERDICT #6: release is rename-FIRST (atomic), closing
    the residual read-then-delete race. Pin the two interleavings the
    old form got wrong or left silent:
    (a) successor rename-broke the stale lease but has NOT yet created
        its own — the zombie's release finds nothing at the lease
        path, renames nothing, raises nothing;
    (b) successor already created its FRESH lease — the zombie's
        release renames it out, sees a foreign id, and renames it
        BACK (restore), never deleting it."""
    import json as _json
    import os
    import time

    from radio_data_pipeline_spark.streaming.dedup import (
        maintenance_lease)

    # (a) lease path empty at release (mid-break window)
    index = str(tmp_path / "idx_a")
    os.makedirs(index)
    lease = f"{index}/_maintenance.lease"
    zombie = maintenance_lease(spark, index, "zombie")
    zombie.__enter__()
    os.remove(lease)  # successor's break renamed it away
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any warning -> failure
        zombie.__exit__(None, None, None)
    assert not os.path.exists(lease)
    # no stray release tombstones left behind
    assert not [p for p in os.listdir(index) if ".released." in p]

    # (b) successor's fresh lease at the path: restored, not deleted
    index2 = str(tmp_path / "idx_b")
    os.makedirs(index2)
    lease2 = f"{index2}/_maintenance.lease"
    zombie2 = maintenance_lease(spark, index2, "zombie")
    zombie2.__enter__()
    old = time.time() - 7200
    os.utime(lease2, (old, old))
    successor = maintenance_lease(spark, index2, "successor")
    successor.__enter__()
    try:
        with pytest.warns(RuntimeWarning, match="usurped"):
            zombie2.__exit__(None, None, None)
        assert os.path.exists(lease2)
        assert _json.loads(open(lease2).read())["op"] == "successor"
        assert not [p for p in os.listdir(index2) if ".released." in p]
    finally:
        successor.__exit__(None, None, None)
    assert not os.path.exists(lease2)


def test_lease_release_legacy_payload_is_foreign(spark, tmp_path):
    """A lease payload without lease_id at release time cannot be
    this op's own — the current version always writes lease_id at
    acquisition, so it is a pre-lease_id-version maintainer that
    usurped after this op aged out (r9 review, inverting the r8
    'deletable' reading: deleting would evict that LIVE op and
    reopen concurrent maintenance). Release must warn and RESTORE
    it, exactly like any other foreign lease."""
    import json as _json
    import os

    from radio_data_pipeline_spark.streaming.dedup import (
        maintenance_lease)

    from radio_data_pipeline_spark.streaming.dedup import (
        _hadoop_fs, _write_small_text)

    index = str(tmp_path / "idx")
    os.makedirs(index)
    lease = f"{index}/_maintenance.lease"
    op = maintenance_lease(spark, index, "modern")
    op.__enter__()
    # a legacy writer's payload replaces ours mid-op — written
    # through the Hadoop fs like a real old-version writer (a raw
    # Python overwrite leaves a stale .crc sidecar, which the
    # checksummed LocalFileSystem read rejects: that exercises the
    # UNREADABLE path, covered below, not the legacy one)
    fs, lpath = _hadoop_fs(spark, lease)
    _write_small_text(fs, lpath,
                      _json.dumps({"op": "legacy", "acquired_at": 0}))
    with pytest.warns(RuntimeWarning, match="legacy"):
        op.__exit__(None, None, None)
    # the legacy successor's lease survives the release
    assert os.path.exists(lease)
    assert "legacy" in open(lease).read()

    # and the UNREADABLE case (torn write / checksum mismatch): the
    # release must RESTORE the file, not delete it — a successor
    # caught mid-write must never be evicted (review r9)
    index2 = str(tmp_path / "idx2")
    os.makedirs(index2)
    lease2 = f"{index2}/_maintenance.lease"
    op2 = maintenance_lease(spark, index2, "modern")
    op2.__enter__()
    with open(lease2, "w") as f:  # stale .crc -> unreadable via fs
        f.write("{torn")
    with pytest.warns(RuntimeWarning, match="unreadable"):
        op2.__exit__(None, None, None)
    assert os.path.exists(lease2)  # restored, leaks only to the TTL


def test_band_meta_cache_rereads_replaced_meta(spark, tmp_path):
    """r8 ADVICE: when the cached meta mismatches the CALL's params,
    re-read _meta.json from disk before raising — another process may
    have deleted and rebuilt the index with new params, and the stale
    in-process entry must not spuriously raise (or silently accept
    outdated params)."""
    import json as _json
    import os
    import shutil

    from radio_data_pipeline_spark.streaming.dedup import (
        _BAND_FORMAT_VERSION, ensure_band_meta)

    index = str(tmp_path / "meta_idx")
    os.makedirs(index)
    ensure_band_meta(spark, index, 3, 8, 2, 3)  # caches prefix_len=3

    # another process rebuilds at the same path with prefix_len=2
    shutil.rmtree(index)
    os.makedirs(index)
    with open(f"{index}/_meta.json", "w") as f:
        f.write(_json.dumps({"format_version": _BAND_FORMAT_VERSION,
                             "prefix_len": 2, "n_hashes": 8,
                             "band_size": 2, "k": 3}))

    # matching the NEW params must succeed (stale cache said 3)
    got = ensure_band_meta(spark, index, 2, 8, 2, 3)
    assert got["prefix_len"] == 2
    # and the OLD params must now be refused against the fresh disk
    with pytest.raises(ValueError, match="layout mismatch"):
        ensure_band_meta(spark, index, 3, 8, 2, 3)


def test_deferred_release_capped(spark):
    """r8 ADVICE (medium): _DEFERRED_RELEASE is a capped FIFO — a
    consumer that never calls release_deferred() (the driver gate)
    cannot accumulate persisted frames without bound across repeated
    builds; eviction unpersists the oldest frame."""
    from radio_data_pipeline_spark.plans.registry import (
        _DEFERRED_CAP, _DEFERRED_RELEASE, defer_unpersist,
        release_deferred)

    release_deferred()  # start clean
    frames = []
    for i in range(_DEFERRED_CAP + 3):
        df = spark.range(5).withColumn("i", F.lit(i)).persist()
        df.count()
        frames.append(defer_unpersist(df))
    assert len(_DEFERRED_RELEASE) == _DEFERRED_CAP
    # the evicted (oldest) frames are unpersisted, the rest cached
    assert all(f.storageLevel.useMemory is False for f in frames[:3])
    assert all(f.storageLevel.useMemory for f in frames[3:])
    # evicted frames still compute correctly (lineage recompute)
    assert frames[0].count() == 5
    assert release_deferred() == _DEFERRED_CAP
    assert not _DEFERRED_RELEASE


def test_band_handle_matches_plain_path(spark, tmp_path):
    """r9 (VERDICT #7, measured first — §22): the BandIndexHandle
    serving path (cached witness-deduped generations + fresh live
    dirs) produces verdicts identical to the per-call plain path,
    across batches, across a compaction (gen-cache auto-refresh),
    and releases its cache on close."""
    from radio_data_pipeline_spark.streaming.dedup import (
        open_band_index)

    df = _corpus(spark)
    idx_a = str(tmp_path / "plain_idx")
    idx_b = str(tmp_path / "handle_idx")
    chunks = _chunks(df, 4, 120)

    # first batch creates _meta.json (the handle needs it to open)
    for idx in (idx_a, idx_b):
        s, bands = dedup_batch_against_index(chunks[0], idx, 0)
        s.count()
        append_batch_bands(bands, idx, 0)
        bands.unpersist()

    h = open_band_index(spark, idx_b)
    got_plain, got_handle = [], []
    try:
        for bid in (1, 2):
            s, bands = dedup_batch_against_index(chunks[bid], idx_a,
                                                 bid)
            got_plain.extend(r["doc_id"] for r in s.collect())
            append_batch_bands(bands, idx_a, bid)
            bands.unpersist()
            s2, bands2 = dedup_batch_against_index(chunks[bid], h,
                                                   bid)
            got_handle.extend(r["doc_id"] for r in s2.collect())
            append_batch_bands(bands2, idx_b, bid)
            bands2.unpersist()
        assert sorted(got_handle) == sorted(got_plain)

        # fold both; the handle must refresh its cache and agree on
        # the next batch
        compact_band_index(spark, idx_a)
        compact_band_index(spark, idx_b)
        names_before = set(h._gen_names)
        s, bands = dedup_batch_against_index(chunks[3], idx_a, 3)
        plain3 = sorted(r["doc_id"] for r in s.collect())
        bands.unpersist()
        s2, bands2 = dedup_batch_against_index(chunks[3], h, 3)
        handle3 = sorted(r["doc_id"] for r in s2.collect())
        bands2.unpersist()
        assert handle3 == plain3
        assert h._gen_names != names_before
        # witness dedup: at most two reps per (band_id, band_hash)
        mx = (h._gen_df.groupBy("band_id", "band_hash").count()
              .agg(F.max("count")).first()[0])
        assert mx <= 2
    finally:
        h.close()
    assert h._gen_df is None


def test_band_handle_witness_dedup_replay_exact(spark, tmp_path):
    """The two-distinct-src_batch witness rule under replay: the
    SAME text indexed by a HIGH-id seed batch and by a low-id batch
    that replays after a fold — the replayed docs must still drop
    (the seed copy witnesses), identically to the plain path."""
    from radio_data_pipeline_spark.streaming.dedup import (
        open_band_index)

    def docs(ids):
        return spark.createDataFrame(
            [(i, "identical payload text for every doc here "
              f"pattern {i % 10}") for i in ids],
            "doc_id long, text string")

    index = str(tmp_path / "wd_band")
    seed = docs(range(1_000_000, 1_000_030))
    live = docs(range(100, 130))
    for b, d in ((1_000_000, seed), (3, live)):
        _, bands = dedup_batch_against_index(d, index, b)
        append_batch_bands(bands, index, b)
        bands.unpersist()
    compact_band_index(spark, index)

    s_plain, b_plain = dedup_batch_against_index(live, index, 3)
    plain = sorted(r["doc_id"] for r in s_plain.collect())
    b_plain.unpersist()
    assert plain == []  # seed copies witness every replayed doc

    h = open_band_index(spark, index)
    try:
        s_h, b_h = dedup_batch_against_index(live, h, 3)
        assert sorted(r["doc_id"] for r in s_h.collect()) == plain
        b_h.unpersist()
    finally:
        h.close()


def test_in_stream_maintenance_skips_on_held_lease(spark, tmp_path):
    """A foreign FRESH lease (external maintainer mid-op) while the
    in-stream policy fires: the maintenance round is SKIPPED with a
    warning — the ingest query must complete with correct survivors,
    not die over transient contention whose next batch re-decides
    (review r9: the lease 'excludes external maintainers' must not
    manifest as query death)."""
    import json as _json
    import os

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, band_index_signals,
        maintenance_skips, reset_maintenance_skips)

    reset_maintenance_skips()
    df = _corpus(spark, 40)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())
    index = str(tmp_path / "idx")
    os.makedirs(index)
    with open(f"{index}/_maintenance.lease", "w") as f:
        f.write(_json.dumps({"op": "external", "lease_id": "x",
                             "acquired_at": 0}))
    src = tmp_path / "src"
    src.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src / "*")))
    q = stream_dedup_ingest(
        stream, index, str(tmp_path / "out"),
        checkpoint=str(tmp_path / "cp"),
        maintenance_policy=BandMaintenancePolicy(
            compact_after_batches=1))
    q.awaitTermination()  # must NOT raise
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(str(tmp_path / "out"))
                 .select("doc_id").collect())
    assert got == expected
    # the round was skipped: nothing folded, foreign lease untouched
    assert band_index_signals(spark, index)["generations"] == 0
    assert _json.loads(
        open(f"{index}/_maintenance.lease").read())["op"] == "external"
    # r9 VERDICT #5: the skip must be COUNTABLE, not just printed — a
    # production loop alerts on persistent lease contention through
    # maintenance_skips(), which foreachBatch warnings can't feed
    skips = maintenance_skips(index)
    assert skips["total"] >= 1
    assert skips["by_site"] == {f"{index}::band_ingest": skips["total"]}
    assert skips["recent"][-1]["site"] == "band_ingest"
    assert "lease" in skips["recent"][-1]["reason"]
    # filtered view excludes other indexes; global view includes this
    assert maintenance_skips("/nonexistent")["total"] == 0
    assert maintenance_skips()["total"] >= skips["total"]
    reset_maintenance_skips()
    assert maintenance_skips()["total"] == 0


def test_maintenance_skips_persist_across_processes(tmp_path):
    """r10 VERDICT #4: skip records outlive the recording process.
    Simulated process boundary: record skips, then wipe the module's
    in-memory state (what a process exit does) — a 'second process'
    calling maintenance_skips(index_path) still sees the full history
    in the persisted section, including records written under a
    DIFFERENT pid (a concurrent driver's jsonl)."""
    import json as _json
    import os

    from radio_data_pipeline_spark.streaming.dedup import (
        _MAINT_SKIP_DIRNAME, maintenance_skips,
        record_maintenance_skip, reset_maintenance_skips)

    reset_maintenance_skips()
    index = str(tmp_path / "idx")
    os.makedirs(index)
    record_maintenance_skip(index, "band_ingest", "lease held (t1)")
    record_maintenance_skip(index, "semantic_ingest",
                            "lease held (t2)")
    # a SECOND driver's file (different pid, cross-process append)
    other = {"index_path": index, "site": "band_ingest",
             "reason": "lease held (other driver)", "time": 1.0,
             "pid": 99999}
    with open(os.path.join(index, _MAINT_SKIP_DIRNAME,
                           "skips-99999.jsonl"), "w") as f:
        f.write(_json.dumps(other) + "\n")

    # process 1 sees: 2 in-memory + 3 persisted
    rep = maintenance_skips(index)
    assert rep["total"] == 2
    assert rep["persisted"]["total"] == 3
    assert rep["persisted"]["by_site"][f"{index}::band_ingest"] == 2

    # "process exit": in-memory state gone; the fresh process still
    # reads the whole history from disk
    reset_maintenance_skips()
    rep2 = maintenance_skips(index)
    assert rep2["total"] == 0
    assert rep2["persisted"]["total"] == 3
    assert {r["pid"] for r in rep2["persisted"]["recent"]} >= \
        {os.getpid(), 99999}
    # no index_path -> in-memory-only report, no persisted section
    assert "persisted" not in maintenance_skips()


def test_concurrent_external_maintenance_never_corrupts(spark,
                                                        tmp_path):
    """A genuinely PARALLEL external maintainer (tight
    maintain_band_index loop on its own thread) racing a serving
    loop. The contract this pins: concurrent folds may FAIL an
    in-flight serve transiently (a listed dir deleted before its
    read — availability, not correctness; the deployment shape runs
    maintenance between batches precisely to avoid it), but a plain
    RETRY of the same batch id replays to correct verdicts in every
    interleaving: own-batch src_batch exclusion covers re-appends,
    per-batch-dir overwrites cover partial writes, and a fold's
    relabeling between attempts stays visible to the exclusion. The
    final survivor set must equal the sequential reference exactly."""
    import threading

    df = _corpus(spark, 120)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, maintain_band_index)

    index = str(tmp_path / "raced_idx")
    stop = threading.Event()
    actions = []

    def maintainer():
        pol = BandMaintenancePolicy(compact_after_batches=1)
        while not stop.is_set():
            try:
                rep = maintain_band_index(spark, index, pol)
                if rep["action"] != "noop":
                    actions.append(rep["action"])
            except Exception:
                pass  # lease contention/transient: keep hammering

    from pyspark import inheritable_thread_target
    t = threading.Thread(
        target=inheritable_thread_target(maintainer), daemon=True)
    t.start()
    got = []
    try:
        for bid, chunk in enumerate(_chunks(df, 6, 120)):
            for attempt in range(8):
                try:
                    survivors, bands = dedup_batch_against_index(
                        chunk, index, bid)
                    ids = [r["doc_id"] for r in
                           survivors.select("doc_id").collect()]
                    append_batch_bands(bands, index, bid)
                    bands.unpersist()
                    break
                except Exception:
                    if attempt == 7:
                        raise
            got.extend(ids)
    finally:
        stop.set()
        t.join(timeout=120)
    assert sorted(got) == expected
    # not vacuous: folds really ran while batches were in flight
    assert "compact" in actions


def test_zero_row_append_does_not_break_readers(spark, tmp_path):
    """A zero-row append (e.g. an empty arriving file, or a
    multi-signal batch whose every doc an upstream gate dropped)
    commits a _SUCCESS-only ingest dir. Every reader must tolerate
    it: the serving handle, the path-mode kernel probe, and the
    compactor — which deletes it (folding an empty dir IS deleting
    it)."""
    from radio_data_pipeline_spark.streaming.dedup import (
        _index_has_batches, band_index_signals, open_band_index)

    df = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f")
         for i in range(10)], "doc_id long, text string")
    index = str(tmp_path / "idx")
    s0, bands0 = dedup_batch_against_index(df, index, 0)
    assert s0.count() == 10
    append_batch_bands(bands0, index, 0)
    # batch 1 contributed nothing: zero-row bands frame
    append_batch_bands(bands0.filter(F.lit(False)), index, 1)
    bands0.unpersist()
    assert band_index_signals(spark, index)["live_batches"] == 2

    # path-mode probe over the root read still works
    twin = df.withColumn("doc_id", F.col("doc_id") + 100)
    s2, bands2 = dedup_batch_against_index(twin, index, 2)
    assert s2.count() == 0  # all 10 match their indexed originals
    bands2.unpersist()

    # the serving handle skips the data-less dir
    h = open_band_index(spark, index)
    try:
        s3, bands3 = dedup_batch_against_index(twin, h, 3)
        assert s3.count() == 0
        bands3.unpersist()
    finally:
        h.close()

    # compaction folds the real dir and deletes the empty one too
    assert compact_band_index(spark, index) == 2
    sig = band_index_signals(spark, index)
    assert sig["live_batches"] == 0 and sig["generations"] == 1

    # an index holding ONLY a zero-row dir: has-batches says no data,
    # the kernel probes it as empty, and compaction just deletes
    empty_idx = str(tmp_path / "empty_idx")
    s4, bands4 = dedup_batch_against_index(df, empty_idx, 0)
    append_batch_bands(bands4.filter(F.lit(False)), empty_idx, 0)
    bands4.unpersist()
    assert not _index_has_batches(spark, empty_idx)
    s5, bands5 = dedup_batch_against_index(df, empty_idx, 1)
    assert s5.count() == 10  # nothing indexed, nothing dropped
    bands5.unpersist()
    assert compact_band_index(spark, empty_idx) == 1
    assert band_index_signals(spark, empty_idx)["live_batches"] == 0


def test_stream_dedup_ingest_with_handle(spark, tmp_path):
    """stream_dedup_ingest(handle=...) — parallel commit + handle —
    still produces the batch-greedy survivor set under id-ordered
    arrival, and refuses a handle opened on another index."""
    import pytest as _pytest

    from radio_data_pipeline_spark.functions.dedup import (
        greedy_band_survivors)
    from radio_data_pipeline_spark.streaming.dedup import (
        open_band_index)

    df = _corpus(spark)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    index = str(tmp_path / "idx")
    cp = str(tmp_path / "cp")

    # seed batch through the kernel to create _meta.json, then
    # open. SEED IDS MUST NOT COLLIDE WITH STREAM BATCH IDS (the
    # documented 1e6 offset rule): the stream's own batch 0 would
    # otherwise overwrite the seed's survivor/index dirs.
    chunk0 = df.filter(F.col("doc_id") < 40)
    s, bands = dedup_batch_against_index(chunk0, index, 1_000_000)
    (s.write.mode("overwrite").parquet(f"{out}/batch=1000000"))
    append_batch_bands(bands, index, 1_000_000)
    bands.unpersist()

    h = open_band_index(spark, index)
    try:
        with _pytest.raises(ValueError, match="open on"):
            stream_dedup_ingest(
                spark.readStream.schema("doc_id long, text string")
                .parquet(str(src / "*")),
                str(tmp_path / "other"), out, checkpoint=cp, handle=h)
        for phase, (lo, hi) in enumerate([(40, 80), (80, 120)]):
            (df.filter((F.col("doc_id") >= lo)
                       & (F.col("doc_id") < hi))
             .coalesce(1).write.mode("overwrite")
             .parquet(str(src / f"f{phase}")))
            stream = (spark.readStream
                      .schema("doc_id long, text string")
                      .parquet(str(src / "*")))
            q = stream_dedup_ingest(stream, index, out,
                                    checkpoint=cp, handle=h)
            q.awaitTermination()
    finally:
        h.close()
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out).select("doc_id").collect())
    assert got == expected


def test_band_maintenance_decision_table():
    """decide_band_maintenance is a pure function — pin the table:
    live-dir count trips compaction at the threshold; the file-count
    trigger fires only when something is actually foldable (a fully
    folded one-generation index must not churn however large its
    file count); otherwise noop."""
    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, decide_band_maintenance)

    p = BandMaintenancePolicy(compact_after_batches=4,
                              compact_over_files=100)

    def sig(live=0, gens=0, live_files=0, gen_files=0, rows=0):
        return {"live_batches": live, "generations": gens,
                "files": live_files + gen_files,
                "live_files": live_files, "gen_files": gen_files,
                "rows": rows}

    # noop: few batches, few files
    assert decide_band_maintenance(
        sig(live=3, gens=1, live_files=40, gen_files=10),
        p)[0] == "noop"
    # compact: live batches at threshold
    assert decide_band_maintenance(sig(live=4, live_files=10),
                                   p)[0] == "compact"
    # compact: live-file excess at threshold with foldable live dir
    assert decide_band_maintenance(
        sig(live=1, gens=1, live_files=100), p)[0] == "compact"
    # compact: gen files count as excess with >1 generation, no
    # lives (crash leftovers from an interrupted fold)
    assert decide_band_maintenance(
        sig(live=0, gens=2, gen_files=100), p)[0] == "compact"
    # NOOP: huge files but nothing foldable — one generation, zero
    # lives (the no-churn guard)
    assert decide_band_maintenance(
        sig(live=0, gens=1, gen_files=9999), p)[0] == "noop"
    # NOOP: the folded FLOOR never counts toward the bar — one live
    # dir with few files over a single huge generation must not
    # re-fold the whole index every batch (review r9: the exact
    # O(index)-per-batch churn a prefix_len=3 layout hit against
    # the 4096 default)
    assert decide_band_maintenance(
        sig(live=1, gens=1, live_files=10, gen_files=50000),
        p)[0] == "noop"
    # legacy signals dict (no live/gen split): old total-files rule
    assert decide_band_maintenance(
        {"live_batches": 1, "generations": 1, "files": 100},
        p)[0] == "compact"
    # empty index
    assert decide_band_maintenance(sig(), p)[0] == "noop"


def test_maintain_band_index_serving_loop(spark, tmp_path):
    """The policy loop against a real band index: noop below the
    batch threshold, compaction fires AT the threshold (folding live
    dirs into one generation), then noop again; dry_run never
    mutates; verdicts are identical through maintenance; and an open
    serving handle picks up the fold transparently on its next call."""
    import glob as _glob

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy, maintain_band_index, open_band_index)

    df = _corpus(spark)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())
    index = str(tmp_path / "m_idx")
    pol = BandMaintenancePolicy(compact_after_batches=3,
                                compact_over_files=10**9)

    handle = None
    got, fired = [], []
    try:
        for bid, chunk in enumerate(_chunks(df, 6, 120)):
            survivors, bands = dedup_batch_against_index(
                chunk, handle if handle is not None else index, bid)
            got.extend(r["doc_id"] for r in
                       survivors.select("doc_id").collect())
            append_batch_bands(bands, index, bid)
            bands.unpersist()
            if handle is None:  # _meta.json exists after batch 0
                handle = open_band_index(spark, index)
            rep = maintain_band_index(spark, index, pol)
            fired.append((rep["action"],
                          rep["signals"]["live_batches"]))
    finally:
        if handle is not None:
            handle.close()
    # the full incremental run through handle + maintenance still
    # equals the batch greedy survivor set
    assert sorted(got) == expected
    # cadence: noop at 1-2 live dirs, compact at 3, counter resets
    # (each fold leaves one negative generation)
    assert [a for a, _ in fired] == ["noop", "noop", "compact",
                                     "noop", "noop", "compact"]
    assert fired[2][1] == 3
    gens = _glob.glob(f"{index}/ingest_batch=*")
    assert len(gens) == 1 and gens[0].endswith("ingest_batch=-2")

    # dry_run reports without acting even when the trigger is hot
    hot = BandMaintenancePolicy(compact_after_batches=1,
                                compact_over_files=1)
    rep = maintain_band_index(spark, index, hot, dry_run=True)
    assert rep["result"] is None
    assert len(_glob.glob(f"{index}/ingest_batch=*")) == 1

    # the no-churn guard end-to-end: one generation, zero lives,
    # file threshold of 1 — still noop
    rep = maintain_band_index(spark, index, hot)
    assert rep["action"] == "noop" and rep["result"] is None

    # verdicts survive maintenance: a replayed duplicate batch is
    # fully dropped against the folded index
    s, b = dedup_batch_against_index(_chunks(df, 6, 120)[0], index, 99)
    assert s.count() == 0
    b.unpersist()


def test_stream_dedup_ingest_with_in_stream_maintenance(
        spark, tmp_path):
    """stream_dedup_ingest(maintenance_policy=...) — the one-call
    serve+maintain loop: maintenance runs inside foreachBatch after
    each batch's commits, so the stream folds its own index.
    Survivors still equal the batch greedy set, and the index ends
    the run folded (one negative generation plus at most the
    post-fold live batches)."""
    import glob as _glob

    from radio_data_pipeline_spark.streaming.dedup import (
        BandMaintenancePolicy)

    df = _corpus(spark)
    expected = sorted(
        r["doc_id"]
        for r in greedy_band_survivors(df).select("doc_id").collect())

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "survivors")
    index = str(tmp_path / "band_index")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, text string"
    pol = BandMaintenancePolicy(compact_after_batches=2,
                                compact_over_files=10**9)

    for phase, (lo, hi) in enumerate([(0, 30), (30, 60),
                                      (60, 90), (90, 120)]):
        (df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite")
         .parquet(str(src / f"f{phase}")))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = stream_dedup_ingest(stream, index, out, checkpoint=cp,
                                maintenance_policy=pol)
        q.awaitTermination()

    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out).select("doc_id").collect())
    assert got == expected
    # 4 batches with compact-every-2: folds fired inside the stream,
    # leaving exactly one (strictly decreasing) generation and zero
    # live dirs (the last batch tripped the bar too)
    dirs = sorted(_glob.glob(f"{index}/ingest_batch=*"))
    gens = [d for d in dirs if "=-" in d]
    lives = [d for d in dirs if "=-" not in d]
    assert len(gens) == 1 and len(lives) < 2, dirs

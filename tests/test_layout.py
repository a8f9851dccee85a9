"""Dataset-layout sinks: partition pruning must be visible in the
reader's physical plan, shard membership must be deterministic."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from radio_data_pipeline_spark.sources.layout import (
    shard_id,
    write_partitioned_dataset,
    write_training_shards,
)
from radio_data_pipeline_spark.sources.parquet import load_table


def _plan(spark, df) -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def test_partitioned_write_enables_partition_pruning(spark, sf_dir,
                                                     tmp_path):
    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "event_type", "value")
    out = str(tmp_path / "events_by_type")
    write_partitioned_dataset(ev, out, ["event_type"])

    back = spark.read.parquet(out)
    filtered = back.filter(F.col("event_type") == "view")
    plan = _plan(spark, filtered)
    # the partition-column filter must prune directories at planning
    # time, not scan-and-discard rows
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split(
        "\n", 1)[0]
    assert filtered.count() == ev.filter(
        F.col("event_type") == "view").count()
    # one coalesced file per partition value
    for d in glob.glob(f"{out}/event_type=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_training_shards_deterministic_and_complete(spark, sf_dir,
                                                    tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "doc_shards")
    write_training_shards(docs, out, "doc_id", n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # exactly one file per shard directory
    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) == 4
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    # membership is a pure function of the key: recomputing the
    # assignment from the read-back rows must agree with the directory
    mismatch = (back.withColumn("expected", shard_id("doc_id", 4))
                .filter(F.col("shard") != F.col("expected")).count())
    assert mismatch == 0
    # reader pointed at one shard prunes to that directory
    one = back.filter(F.col("shard") == 2)
    plan = _plan(spark, one)
    assert "PartitionFilters" in plan


def test_streaming_shard_sink_matches_batch_membership(spark, sf_dir,
                                                       tmp_path):
    from radio_data_pipeline_spark.streaming.events import (
        read_events_stream,
        stream_to_training_shards,
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "event_shards")
    q = stream_to_training_shards(
        read_events_stream(spark, str(src)).select("event_id", "user_id",
                                                   "value"),
        out, "event_id", n_shards=4,
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()

    back = spark.read.parquet(out)
    batch = load_table(spark, sf_dir, "events")
    assert back.count() == batch.count()
    mismatch = (back.withColumn("expected", shard_id("event_id", 4))
                .filter(F.col("shard") != F.col("expected")).count())
    assert mismatch == 0


def test_physical_filter_observed_reports_drop_counts(spark):
    from radio_data_pipeline_spark.operators.validation import (
        physical_filter_observed,
    )
    df = spark.createDataFrame(
        [(1.0, 2.0), (-1.0, 3.0), (4.0, -5.0), (6.0, 7.0)],
        ["TSYS", "TCAL"])
    filtered, obs = physical_filter_observed(df)
    assert filtered.count() == 2
    got = obs.get
    assert got["n_input"] == 4
    assert got["n_negative"] == 2


def test_fits_corpus_to_partitioned_lake(spark, tmp_path):
    """End-to-end corpus story: SDFITS files in, distributed decode +
    validation, hive-partitioned parquet lake out, pruned read back —
    the full ingest-to-layout composition a telescope archive runs."""
    from tests.test_fits import HEADER, HISTORY, _obs_pdf
    from radio_data_pipeline_spark.operators.validation import (
        physical_filter_observed,
    )
    from radio_data_pipeline_spark.sources.fits import (
        read_sdfits,
        write_sdfits,
    )

    src = tmp_path / "fits"
    src.mkdir()
    for i in range(3):
        (src / f"obs{i}.fits").write_bytes(
            write_sdfits(_obs_pdf(n_science=12), HEADER, HISTORY))

    df = read_sdfits(spark, str(src / "*.fits"), dense_ids=True)
    validated, obs = physical_filter_observed(df)
    out = str(tmp_path / "lake")
    write_partitioned_dataset(validated.withColumn(
        "obs_id", F.col("obs_id")), out, ["obs_id"])
    assert obs.get["n_input"] == df.count()

    back = spark.read.parquet(out)
    assert back.count() == validated.count()
    one = back.filter(F.col("obs_id") == 1)
    plan = _plan(spark, one)
    assert "PartitionFilters" in plan
    assert one.count() == validated.filter(F.col("obs_id") == 1).count()


def test_zorder_write_shrinks_per_file_spans(spark, sf_dir, tmp_path):
    """Z-ordered files must cover narrow ranges in BOTH dimensions:
    the mean per-file (max-min) span of each dimension must be well
    under the global span (that shrinkage IS the min/max pruning
    win), and the layout must be lossless."""
    import pyarrow.parquet as pq

    from radio_data_pipeline_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id",
                F.floor("value").cast("long").alias("vbucket"))
    out = str(tmp_path / "events_zorder")
    write_zordered(ev, out, F.col("user_id"), F.col("vbucket"),
                   n_files=16)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 8  # range partitioner may merge empty ends

    def spans(col):
        out_spans = []
        for f in files:
            t = pq.read_table(f, columns=[col])[col]
            vals = t.to_pylist()
            if vals:
                out_spans.append(max(vals) - min(vals))
        return out_spans

    n_total, u_glob, v_glob = ev.agg(
        F.count(F.lit(1)),
        F.max("user_id") - F.min("user_id"),
        F.max("vbucket") - F.min("vbucket")).first()

    u_spans, v_spans = spans("user_id"), spans("vbucket")
    mean_u = sum(u_spans) / len(u_spans)
    mean_v = sum(v_spans) / len(v_spans)
    # Z-order on two 16-bit dims: each of 16 curve segments should
    # span a fraction of both global ranges; a single-column sort
    # would give ~full span in the other dimension.
    assert mean_u < 0.5 * u_glob, (mean_u, u_glob)
    assert mean_v < 0.5 * v_glob, (mean_v, v_glob)
    # lossless
    back = spark.read.parquet(out)
    assert back.count() == n_total
    assert back.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]


def test_dynamic_partition_overwrite_scopes_to_written_partitions(
        spark, sf_dir, tmp_path):
    """Overwriting a recomputed single partition must replace that
    partition only; all other partitions stay byte-identical."""
    from radio_data_pipeline_spark.sources.layout import (
        overwrite_partitions,
        write_partitioned_dataset,
    )

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "event_type", "value")
    out = str(tmp_path / "events_dyn")
    write_partitioned_dataset(ev, out, ["event_type"])

    before = {r["event_type"]: (r["n"], r["s"]) for r in
              spark.read.parquet(out)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("event_id").alias("s")).collect()}
    target = sorted(before)[0]

    patch = (ev.where(F.col("event_type") == target)
             .withColumn("value", F.col("value") * 2))
    overwrite_partitions(patch, out, ["event_type"])

    after_df = spark.read.parquet(out)
    after = {r["event_type"]: (r["n"], r["s"]) for r in
             after_df.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("event_id").alias("s")).collect()}
    assert after == before  # same membership in every partition
    # but the target partition's payload was really rewritten
    doubled = (after_df.where(F.col("event_type") == target)
               .agg(F.round(F.sum("value"), 2)).first()[0])
    orig = (ev.where(F.col("event_type") == target)
            .agg(F.round(F.sum("value") * 2, 2)).first()[0])
    assert doubled == orig


def test_schema_evolution_merge_across_generations(spark, sf_dir,
                                                   tmp_path):
    """A dataset whose later files gained a column must read as the
    union schema with NULLs for the old files — the additive schema
    evolution every long-lived lake layout depends on."""
    out = str(tmp_path / "events_evolving")
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.where(F.col("event_id") % 2 == 0) \
        .select("event_id", "user_id", "value")
    v2 = ev.where(F.col("event_id") % 2 == 1) \
        .select("event_id", "user_id", "value",
                (F.col("value") > 100).alias("is_large"))
    v1.write.parquet(out + "/gen=1")
    v2.write.parquet(out + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"event_id", "user_id", "value",
                                   "is_large", "gen"}
    assert merged.count() == ev.count()
    # old generation reads NULL for the new column, new reads values
    nulls = merged.where(F.col("gen") == 1) \
        .where(F.col("is_large").isNotNull()).count()
    assert nulls == 0
    n_large = merged.where(F.col("is_large")).count()
    exp_large = ev.where((F.col("event_id") % 2 == 1)
                         & (F.col("value") > 100)).count()
    assert n_large == exp_large


def test_compaction_collapses_small_files(spark, sf_dir, tmp_path):
    """Many tiny files must compact to the byte-budgeted count with
    the data intact."""
    from radio_data_pipeline_spark.sources.layout import (
        compact_dataset,
        dataset_size_bytes,
    )

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "value")
    frag = str(tmp_path / "fragmented")
    ev.repartition(40).write.parquet(frag)  # simulate micro-batch debris
    assert len(glob.glob(frag + "/part-*.parquet")) == 40

    total = dataset_size_bytes(spark, frag)
    out = str(tmp_path / "compacted")
    target = total // 3  # force ~3-4 output files
    n = compact_dataset(spark, frag, out, target_file_bytes=target)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == n <= 4
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).first()[0] == \
        ev.agg(F.sum("event_id")).first()[0]


# --- dense_index: the scalable 0..N-1 position builder (VERDICT r4 #1) ---

SCALE10 = "/root/repo/.bench_scale/sf1"


def test_dense_index_matches_global_window(spark):
    """Two-pass partition-offset index == row_number().over(orderBy)
    for non-contiguous longs AND strings (the obs-id path)."""
    from radio_data_pipeline_spark.sources.layout import dense_index

    ids = [3, 1, 17, 100, 42, 8, 999, 0, 55, 23]
    df = spark.createDataFrame([(i, f"r{i}") for i in ids],
                               "k long, payload string")
    got = {r["k"]: r["pos"] for r in dense_index(df, "k").collect()}
    assert got == {k: p for p, k in enumerate(sorted(ids))}
    # payload columns survive
    assert set(dense_index(df, "k").columns) == {"k", "payload", "pos"}

    paths = [f"file_{i:03d}.fits" for i in ids]
    sdf = spark.createDataFrame([(p,) for p in paths], "path string")
    got_s = {r["path"]: r["pos"] for r in dense_index(sdf, "path").collect()}
    assert got_s == {p: i for i, p in enumerate(sorted(paths))}

    # empty input -> empty output with the pos column present
    empty = dense_index(df.limit(0), "k")
    assert empty.count() == 0 and "pos" in empty.columns


def test_dense_index_rejects_null_order_values(spark):
    """A NULL order value would NULL the bucket expression and the
    row would silently vanish through the inner offset join (r5
    advice: N_out < N_in with no error) — rejected up front instead,
    riding the existing count pass."""
    import pytest as _pytest

    from radio_data_pipeline_spark.sources.layout import dense_index

    df = spark.createDataFrame([(1,), (None,), (3,)], "k long")
    with _pytest.raises(ValueError, match="NULL"):
        dense_index(df, "k").collect()


def test_dense_index_boundary_sample_capped_at_high_bucket_count(spark):
    """boundary_sample_cap bounds the driver collect independently of
    n_buckets (r5 verdict #7: shuffle.partitions=10k would otherwise
    collect ~2M values); positions stay exactly dense under a cap far
    smaller than n_buckets * boundary_sample_rows."""
    from radio_data_pipeline_spark.sources.layout import dense_index

    n = 5000
    ids = [(i * 2654435761) % (1 << 31) for i in range(n)]  # unique
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    out = dense_index(df, "k", n_buckets=2048,
                      boundary_sample_rows=200,
                      boundary_sample_cap=500)
    got = {r["k"]: r["pos"] for r in out.collect()}
    assert got == {k: p for p, k in enumerate(sorted(ids))}


def test_dense_index_no_single_partition_exchange(spark, sf_dir):
    """The whole point: the sort is partitioned by the range bucket,
    never an Exchange SinglePartition over the full table."""
    from radio_data_pipeline_spark.sources.layout import dense_index

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    idx = dense_index(emb, "vec_id")
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(_db" in plan

    # and the registered query that motivated the builder: every
    # Window operator in its plan must be partitioned by the bucket
    from radio_data_pipeline_spark.plans.registry import all_queries
    q = all_queries()["negative_samples_per_anchor"]
    qplan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for line in qplan.splitlines():
        if "Window [" in line:
            assert "_db" in line, line


@pytest.mark.skipif(not os.path.isdir(SCALE10),
                    reason="10x scale corpus not generated "
                           "(tools/make_scale_data.py 10 .bench_scale/sf1)")
def test_dense_index_parallelizes_at_10x(spark):
    """At the 10x corpus the index stage runs across many buckets and
    still yields a dense permutation 0..N-1."""
    import re

    from radio_data_pipeline_spark.sources.layout import dense_index

    emb = spark.read.parquet(f"{SCALE10}/embeddings.parquet") \
        .select("vec_id")
    n = emb.count()
    idx = dense_index(emb, "vec_id")
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    m = re.search(r"hashpartitioning\(_db#\d+, (\d+)\)", plan)
    assert m is not None and int(m.group(1)) > 1
    stats = idx.agg(F.count(F.lit(1)).alias("n"),
                    F.countDistinct("pos").alias("d"),
                    F.min("pos").alias("lo"),
                    F.max("pos").alias("hi")).first()
    assert stats["n"] == n
    assert stats["d"] == n          # a permutation: all distinct
    assert stats["lo"] == 0 and stats["hi"] == n - 1   # ...and dense


def test_ivf_index_write_probe_prunes_and_matches_inline(spark, sf_dir,
                                                         tmp_path):
    """The persisted ANN index: write_ivf_index partitions by the
    inverted list; a probe must (a) read ONLY its nprobe directories
    — pruning proven on actual input files, not just the plan string —
    and (b) return exactly what inline ivf_topk computes."""
    from radio_data_pipeline_spark.functions.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, n_centroids=8, seed=11)
    # all 8 inverted lists materialized as hive dirs
    lists = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(path, "ivf_list=*")))
    assert len(lists) == 8

    out = ivf_topk_indexed(spark, path, qvec, k=10,
                           n_centroids=8, nprobe=2, seed=11)
    # planning-time pruning: the probe is a PARTITION filter on the
    # scan (directory-listing level), not a post-scan row filter —
    # exactly two lists appear in it
    plan = _plan(spark, out)
    pf_line = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "ivf_list" in pf_line and " IN (" in pf_line
    assert len(pf_line.split("IN (")[1].split(")")[0].split(",")) == 2
    # and the probed directories alone hold every candidate row the
    # indexed scan sees (file-level equivalence; inputFiles() can't
    # show pruning — it reports the pre-pruning relation)
    probe = [int(x) for x in
             pf_line.split("IN (")[1].split(")")[0].split(",")]
    direct = spark.read.parquet(
        *[os.path.join(path, f"ivf_list={p}") for p in probe])
    pruned_scan_rows = (spark.read.parquet(path)
                        .filter(F.col("ivf_list").isin(probe)).count())
    assert direct.count() == pruned_scan_rows

    inline = ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2, seed=11)
    assert sorted(map(tuple, out.collect())) \
        == sorted(map(tuple, inline.collect()))

    # an open_index() handle (the probe-loop form that skips per-call
    # directory relisting — §15 add. 3 measured 2.40 -> 0.18 s/query)
    # returns the identical result
    from radio_data_pipeline_spark.functions.similarity import open_index
    handle = open_index(spark, path)
    via_handle = ivf_topk_indexed(spark, handle, qvec, k=10,
                                  n_centroids=8, nprobe=2, seed=11)
    assert sorted(map(tuple, via_handle.collect())) \
        == sorted(map(tuple, out.collect()))


def test_lsh_index_write_multiprobe_prunes_and_matches_inline(
        spark, sf_dir, tmp_path):
    """write_lsh_index + lsh_multiprobe_topk_indexed: the probe
    schedule must become a planning-time partition filter with
    exactly n_probes buckets, and results must equal the inline
    multi-probe scan."""
    from radio_data_pipeline_spark.functions.similarity import (
        lsh_multiprobe_topk,
        lsh_multiprobe_topk_indexed,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, path, n_planes=6, seed=7)

    out = lsh_multiprobe_topk_indexed(spark, path, qvec, k=10,
                                      n_planes=6, n_probes=4, seed=7)
    plan = _plan(spark, out)
    pf_line = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "lsh_bucket" in pf_line and " IN (" in pf_line
    assert len(pf_line.split("IN (")[1].split(")")[0].split(",")) == 4

    inline = lsh_multiprobe_topk(emb, qvec, k=10, n_planes=6,
                                 n_probes=4, seed=7)
    assert sorted(map(tuple, out.collect())) \
        == sorted(map(tuple, inline.collect()))

    # open_index() handle parity (the probe-loop fast path)
    from radio_data_pipeline_spark.functions.similarity import open_index
    handle = open_index(spark, path)
    via_handle = lsh_multiprobe_topk_indexed(spark, handle, qvec, k=10,
                                             n_planes=6, n_probes=4,
                                             seed=7)
    assert sorted(map(tuple, via_handle.collect())) \
        == sorted(map(tuple, out.collect()))


def test_index_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Incremental refresh: building the index from half the corpus
    then APPENDING the other half must answer every probe exactly
    like an index built from the whole corpus in one shot — for both
    the LSH and IVF layouts (same seeded quantizer => same bucket
    per vector regardless of which write filed it)."""
    from radio_data_pipeline_spark.functions.similarity import (
        append_to_ivf_index,
        append_to_lsh_index,
        ivf_topk_indexed,
        lsh_multiprobe_topk_indexed,
        write_ivf_index,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    qvec = [float(v) for v in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    lsh_inc = str(tmp_path / "lsh_inc")
    lsh_full = str(tmp_path / "lsh_full")
    write_lsh_index(first, lsh_inc, n_planes=6, seed=7)
    append_to_lsh_index(second, lsh_inc, n_planes=6, seed=7)
    write_lsh_index(emb, lsh_full, n_planes=6, seed=7)
    a = lsh_multiprobe_topk_indexed(spark, lsh_inc, qvec, k=10,
                                    n_planes=6, n_probes=4, seed=7)
    b = lsh_multiprobe_topk_indexed(spark, lsh_full, qvec, k=10,
                                    n_planes=6, n_probes=4, seed=7)
    assert sorted(map(tuple, a.collect())) \
        == sorted(map(tuple, b.collect()))
    # the append touched only bucket dirs, never a full rewrite:
    # incremental and full layouts expose the same bucket set
    assert (sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(lsh_inc, "lsh_bucket=*")))
            == sorted(os.path.basename(p) for p in
                      glob.glob(os.path.join(lsh_full, "lsh_bucket=*"))))

    ivf_inc = str(tmp_path / "ivf_inc")
    ivf_full = str(tmp_path / "ivf_full")
    write_ivf_index(first, ivf_inc, n_centroids=8, seed=11)
    append_to_ivf_index(second, ivf_inc, n_centroids=8, seed=11)
    write_ivf_index(emb, ivf_full, n_centroids=8, seed=11)
    c = ivf_topk_indexed(spark, ivf_inc, qvec, k=10,
                         n_centroids=8, nprobe=2, seed=11)
    d = ivf_topk_indexed(spark, ivf_full, qvec, k=10,
                         n_centroids=8, nprobe=2, seed=11)
    assert sorted(map(tuple, c.collect())) \
        == sorted(map(tuple, d.collect()))


def test_knn_join_indexed_matches_inline_and_prunes(
        spark, sf_dir, tmp_path):
    """knn_join_indexed over a write_lsh_index layout must return
    EXACTLY the inline knn_join's rows (same probe schedule, same
    bucket_cap semantics), while its plan (a) prunes the index scan
    to the batch's distinct probe buckets at planning time and (b)
    broadcasts the query batch instead of shuffling the corpus."""
    from radio_data_pipeline_spark.functions.similarity import (
        knn_join,
        knn_join_indexed,
        open_index,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh_index_knn")
    write_lsh_index(emb, path, n_planes=6, seed=7)
    q_batch = emb.filter(F.col("vec_id") < 20)

    inline = knn_join(q_batch, emb, k=3, n_planes=6, n_probes=2,
                      seed=7)
    indexed = knn_join_indexed(spark, q_batch, path, k=3, n_planes=6,
                               n_probes=2, seed=7)
    assert sorted(map(tuple, indexed.collect())) \
        == sorted(map(tuple, inline.collect()))

    plan = _plan(spark, indexed)
    pf_line = plan.split("PartitionFilters:")[1].split("\n")[0]
    # Catalyst renders small probe lists as "IN (a,b)" and larger
    # ones (>10) as "INSET a,b,..." — accept either
    assert "lsh_bucket" in pf_line
    assert (" IN (" in pf_line) or ("INSET" in pf_line)
    # batch's distinct probes <= n_queries * n_probes, and the probed
    # set must be a strict subset of the populated buckets (pruning
    # is real, not a tautology)
    import glob as _glob
    if " IN (" in pf_line:
        n_pruned = len(pf_line.split("IN (")[1].split(")")[0].split(","))
    else:
        n_pruned = len(pf_line.split("INSET ")[1].split(")")[0].split(","))
    n_dirs = len(_glob.glob(f"{path}/lsh_bucket=*"))
    assert 0 < n_pruned <= 20 * 2
    assert n_pruned < n_dirs
    assert "BroadcastHashJoin" in plan  # query side broadcast

    # open_index() handle parity (serving-loop form)
    handle = open_index(spark, path)
    via_handle = knn_join_indexed(spark, q_batch, handle, k=3,
                                  n_planes=6, n_probes=2, seed=7)
    assert sorted(map(tuple, via_handle.collect())) \
        == sorted(map(tuple, indexed.collect()))


def test_knn_join_indexed_bucket_cap_equals_inline_cap(
        spark, sf_dir, tmp_path):
    """bucket_cap counts rows per bucket on the PRUNED scan; since
    pruning keeps whole buckets, the per-bucket counts — and the md5
    downsample verdicts — must equal the inline form's under a cap
    small enough to engage."""
    from radio_data_pipeline_spark.functions.similarity import (
        knn_join,
        knn_join_indexed,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh_index_cap")
    # few planes -> big buckets, tiny cap -> the downsample engages
    write_lsh_index(emb, path, n_planes=4, seed=7)
    q_batch = emb.filter(F.col("vec_id") < 10)
    inline = knn_join(q_batch, emb, k=3, n_planes=4, n_probes=2,
                      seed=7, bucket_cap=16)
    indexed = knn_join_indexed(spark, q_batch, path, k=3, n_planes=4,
                               n_probes=2, seed=7, bucket_cap=16)
    assert sorted(map(tuple, indexed.collect())) \
        == sorted(map(tuple, inline.collect()))


# --- global_row_number / global_ntile: composite-key two-pass
#     ranking (r6 VERDICT #3 — the global-window rewrite builders) ---


def test_global_row_number_matches_window(spark):
    """Two-pass composite-key rank == row_number().over(orderBy(...))
    including a descending component spelled as a negation and ties
    broken by the second column."""
    from pyspark.sql import Window

    from radio_data_pipeline_spark.sources.layout import (
        global_row_number)

    rows = [(i, float((i * 7) % 13), f"s{i%5}") for i in range(137)]
    df = spark.createDataFrame(rows, "k long, v double, tag string")
    expect = {r["k"]: r["i"] for r in df.withColumn(
        "i", F.row_number().over(
            Window.orderBy(F.desc("v"), "k"))).collect()}
    got = {r["k"]: r["i"] for r in global_row_number(
        df, [-F.col("v"), F.col("k")], rank_col="i",
        n_buckets=8).collect()}
    assert got == expect
    # payload survives; helper columns dropped
    out = global_row_number(df, [F.col("v"), F.col("k")])
    assert set(out.columns) == {"k", "v", "tag", "i"}
    # null key rejected loudly (silent row loss otherwise)
    ndf = spark.createDataFrame([(1, 1.0), (2, None)],
                                "k long, v double")
    with pytest.raises(ValueError, match="NULL"):
        global_row_number(ndf, [F.col("v"), F.col("k")])
    # NaN float key rejected loudly too (r7 ADVICE): Python's
    # boundary sort and Spark's bucket comparison order NaN
    # DIFFERENTLY — non-monotonic boundaries, silently wrong ranks
    nan_df = spark.createDataFrame([(1, 1.0), (2, float("nan"))],
                                   "k long, v double")
    with pytest.raises(ValueError, match="NaN"):
        global_row_number(nan_df, [F.col("v"), F.col("k")])
    # ...and on the ntile path, whose count pass is separate
    from radio_data_pipeline_spark.sources.layout import global_ntile
    with pytest.raises(ValueError, match="NaN"):
        global_ntile(nan_df, [F.col("v"), F.col("k")], 2)


@pytest.mark.parametrize("n,k", [(137, 5), (10, 10), (3, 5), (40, 4)])
def test_global_ntile_matches_window_ntile(spark, n, k):
    """Closed-form tile from the two-pass global position ==
    ntile(k) OVER (ORDER BY ...) exactly, across even splits, ragged
    splits, and n < k."""
    from pyspark.sql import Window

    from radio_data_pipeline_spark.sources.layout import global_ntile

    rows = [(i, float((i * 11) % 29)) for i in range(n)]
    df = spark.createDataFrame(rows, "key long, v double")
    expect = {r["key"]: r["t"] for r in df.withColumn(
        "t", F.ntile(k).over(Window.orderBy("v", "key"))).collect()}
    got = {r["key"]: r["tile"] for r in global_ntile(
        df, [F.col("v"), F.col("key")], k, n_buckets=7).collect()}
    assert got == expect


def test_global_rank_builders_no_single_partition(spark, sf_dir):
    """The point of the builders — and of the three round-7 query
    rewrites: no Exchange SinglePartition anywhere; the unbounded
    ranking work is partitioned by the deterministic range bucket."""
    from radio_data_pipeline_spark.plans.registry import all_queries
    from radio_data_pipeline_spark.sources.layout import (
        global_row_number)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    out = global_row_number(emb, [F.col("vec_id")], n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(_db" in plan

    from radio_data_pipeline_spark.plans.registry import (
        release_deferred)

    q = all_queries()
    # gini: 1 builder window; rfm: 3 (one per ntile score). Every
    # Window node must be the _db-partitioned per-bucket ranking —
    # and at least the expected number MUST be present: the queries
    # return LAZY frames (an eager localCheckpoint here once
    # truncated the plan to Scan ExistingRDD, making this loop pass
    # vacuously — r7 ADVICE).
    for name, min_windows in [("orders_gini_coefficient", 1),
                              ("customer_rfm_segments", 3)]:
        qplan = q[name](spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        release_deferred()
        win_lines = [ln for ln in qplan.splitlines() if "Window [" in ln]
        assert len(win_lines) >= min_windows, (name, qplan)
        for line in win_lines:
            assert "_db" in line, (name, line)
        # (a one-row Exchange SinglePartition remains for gini's final
        # scalar combine — benign; the WINDOW inputs are what must
        # never funnel through one task)

    # pareto: builder window (_db) plus the two cumulative-share
    # windows over the 10-row decile re-aggregate (bounded global
    # windows, allowlisted in test_plans_explain)
    pplan = q["orders_pareto_share"](spark, sf_dir)._jdf \
        .queryExecution().executedPlan().toString()
    release_deferred()
    pwin = [ln for ln in pplan.splitlines() if "Window [" in ln]
    assert any("_db" in ln for ln in pwin), pplan

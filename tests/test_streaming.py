"""Structured Streaming tests: availableNow parity with the batch
forms, and incremental-vs-batch equivalence of the calibration scan.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from radio_data_pipeline_spark.operators.segmentation import (
    find_calibration_indices,
    find_calibrations,
)
from radio_data_pipeline_spark.sources.parquet import load_table
from radio_data_pipeline_spark.sources.synthetic import (
    ObsSpec,
    make_observation_set,
)
from radio_data_pipeline_spark.streaming import (
    CalScanState,
    dedup_events,
    find_calibrations_stream,
    read_events_stream,
    run_available_now,
    session_event_counts,
    sliding_user_activity,
    tumbling_event_counts,
)

import numpy as np


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# --------------------------------------------------------------------------
# Incremental state machine == batch pass (pure python, no Spark)
# --------------------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 1)), min_size=1, max_size=80)


@settings(max_examples=300, deadline=None)
@given(rows=rows_strategy, cc=st.integers(1, 4),
       n_chunks=st.integers(1, 5))
def test_cal_scan_incremental_matches_batch(rows, cc, n_chunks):
    cal = np.array([r[0] for r in rows])
    swp = np.array([r[1] for r in rows])
    modes = [""] * len(rows)
    expected = find_calibration_indices(cal, swp, modes, "track", cc)

    machine = CalScanState()
    bounds = np.linspace(0, len(rows), n_chunks + 1).astype(int)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        machine.feed(cal[lo:hi], swp[lo:hi], modes[lo:hi], "track", cc)
    got = machine.result()
    # batch returns data_start=None only via the fallback path where it
    # then sets 0 explicitly; normalize both to ints
    exp = (expected[0] if expected[0] is not None else 0,
           expected[1], expected[2])
    assert (got[0], got[1], got[2]) == exp


def test_cal_scan_result_is_prefix_consistent():
    # result() after feeding a prefix == batch answer on that prefix
    spec = ObsSpec(obs_id=7, n_science=30, false_start=True, onoff=True)
    from radio_data_pipeline_spark.sources.synthetic import make_observation
    pdf = make_observation(spec)
    cal = pdf["CALSTATE"].to_numpy()
    swp = pdf["SWPVALID"].to_numpy()
    modes = pdf["OBSMODE"].tolist()
    machine = CalScanState()
    for i in range(len(pdf)):
        machine.step(int(cal[i]), int(swp[i]), modes[i], "onoff", 4)
        exp = find_calibration_indices(cal[:i + 1], swp[:i + 1],
                                       modes[:i + 1], "onoff", 4)
        got = machine.result()
        assert got[1] == exp[1] and got[2] == exp[2]
        assert got[0] == (exp[0] if exp[0] is not None else 0)


# --------------------------------------------------------------------------
# Streaming event queries == batch forms (availableNow, memory sink)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def events_stream(spark, sf_smoke, tmp_path_factory):
    # The file stream source requires a directory; stage the read-only
    # single-file table behind a symlink dir.
    d = tmp_path_factory.mktemp("events_stream_src")
    (d / "events.parquet").symlink_to(f"{sf_smoke}/events.parquet")
    return read_events_stream(spark, str(d))


def test_tumbling_counts_stream_matches_batch(spark, sf_smoke,
                                              events_stream):
    got = run_available_now(tumbling_event_counts(events_stream),
                            "t_tumbling", output_mode="complete")
    exp = tumbling_event_counts(load_table(spark, sf_smoke, "events"))
    cols = ["win_start_us", "event_type", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(exp, cols)
    assert len(got.collect()) > 0


def test_session_windows_stream_matches_batch(spark, sf_smoke,
                                              events_stream):
    got = run_available_now(session_event_counts(events_stream),
                            "t_sessions", output_mode="complete")
    exp = session_event_counts(load_table(spark, sf_smoke, "events"))
    cols = ["user_id", "session_start_us", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(exp, cols)


def test_sliding_windows_stream_within_sketch_bound(spark, sf_smoke,
                                                    events_stream):
    # Streams forbid exact distinct agg, so the streaming path counts
    # via HLL++ (rsd=0.01); same windows must appear, each count
    # within 5% of the exact batch count.
    got = {r["win_start_us"]: r["n_users"] for r in
           run_available_now(sliding_user_activity(events_stream),
                             "t_sliding", output_mode="complete")
           .collect()}
    exp = {r["win_start_us"]: r["n_users"] for r in
           sliding_user_activity(load_table(spark, sf_smoke, "events"))
           .collect()}
    assert got.keys() == exp.keys() and len(exp) > 0
    for w, exact in exp.items():
        assert abs(got[w] - exact) <= max(1, 0.05 * exact), (w, got[w], exact)


def test_streaming_dedup_matches_batch_distinct(spark, sf_smoke,
                                                events_stream):
    got = run_available_now(dedup_events(events_stream).select("event_id"),
                            "t_dedup", output_mode="append")
    n_expected = (load_table(spark, sf_smoke, "events")
                  .select("event_id").distinct().count())
    assert got.count() == n_expected


def test_stream_stream_join_matches_batch(spark, sf_smoke, events_stream):
    from radio_data_pipeline_spark.streaming import view_purchase_pairs
    got = run_available_now(view_purchase_pairs(events_stream),
                            "t_ssjoin", output_mode="append")
    exp = view_purchase_pairs(load_table(spark, sf_smoke, "events"))
    cols = ["user_id", "view_id", "purchase_id", "delay_s"]
    assert _sorted_rows(got, cols) == _sorted_rows(exp, cols)
    assert got.count() > 0


# --------------------------------------------------------------------------
# Stateful streaming segmentation == batch operator
# --------------------------------------------------------------------------

def test_streaming_segmentation_matches_batch(spark, tmp_path):
    specs = [ObsSpec(obs_id=0), ObsSpec(obs_id=1, false_start=True),
             ObsSpec(obs_id=2, pre_cal=False)]
    pdf = make_observation_set(specs)
    cols = ["obs_id", "row_idx", "IFNUM", "PLNUM", "CALSTATE", "SWPVALID",
            "OBSMODE"]
    src = str(tmp_path / "obs_stream")
    batch_df = spark.createDataFrame(pdf[cols])
    batch_df.write.parquet(src)

    stream = (spark.readStream.schema(batch_df.schema).parquet(src))
    out = find_calibrations_stream(stream, channel_count=4,
                                   header_obsmode="track")
    q = (out.writeStream.format("memory").queryName("t_seg")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("t_seg").toPandas()
    # latest update per stream (max rows_seen) is the final answer
    got = (got.sort_values("rows_seen")
           .groupby(["obs_id", "IFNUM", "PLNUM"], as_index=False).last())

    exp = find_calibrations(batch_df, channel_count=4,
                            header_obsmode="track").toPandas()

    merged = got.merge(exp, on=["obs_id", "IFNUM", "PLNUM"],
                       suffixes=("_s", "_b"))
    assert len(merged) == len(exp) == 12
    assert (merged["data_start_idx_s"] == merged["data_start_idx_b"]).all()
    assert (merged["post_cal_start_idx_s"]
            == merged["post_cal_start_idx_b"]).all()
    b_off = merged["off_start_idx_b"]
    s_off = merged["off_start_idx_s"]
    assert ((s_off == b_off) | (s_off.isna() & b_off.isna())).all()


def test_streaming_segmentation_recovers_from_checkpoint(spark, tmp_path):
    # state must survive a full query stop/restart: phase 1 ingests the
    # first half of an observation, phase 2 a new file with the rest;
    # the recovered state machine must end exactly where a single batch
    # pass over everything ends
    from radio_data_pipeline_spark.sources.synthetic import make_observation

    pdf = make_observation(ObsSpec(obs_id=5, n_science=40))
    cols = ["obs_id", "row_idx", "IFNUM", "PLNUM", "CALSTATE", "SWPVALID",
            "OBSMODE"]
    pdf = pdf[cols]
    half = len(pdf) // 2
    src = tmp_path / "src"
    src.mkdir()
    cp = str(tmp_path / "checkpoint")
    schema = spark.createDataFrame(pdf).schema

    collected: list = []

    def run_phase(part: pd.DataFrame, fname: str) -> None:
        spark.createDataFrame(part).coalesce(1).write.mode("append") \
            .parquet(str(src / fname))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        out = find_calibrations_stream(stream, channel_count=1,
                                       header_obsmode="track")

        def sink(batch_df, batch_id):
            collected.extend(batch_df.collect())

        q = (out.writeStream.foreachBatch(sink)
             .option("checkpointLocation", cp)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()

    run_phase(pdf.iloc[:half], "part1")
    rows_after_1 = [r for r in collected]
    assert rows_after_1 and max(r["rows_seen"] for r in rows_after_1) == half

    run_phase(pdf.iloc[half:], "part2")
    final = max(collected, key=lambda r: r["rows_seen"])
    assert final["rows_seen"] == len(pdf)

    exp = find_calibration_indices(
        pdf["CALSTATE"].to_numpy(), pdf["SWPVALID"].to_numpy(),
        pdf["OBSMODE"].tolist(), "track", 1)
    assert final["data_start_idx"] == (exp[0] if exp[0] is not None else 0)
    assert final["post_cal_start_idx"] == exp[1]


def test_training_shards_exactly_once_after_midwrite_crash(spark, tmp_path):
    """Kill-and-restart proof of the exactly-once contract
    (streaming/events.py stream_to_training_shards): a micro-batch
    that died MID-WRITE leaves a partial, uncommitted ``batch=N``
    directory on disk; on restart from the checkpoint the batch
    re-executes and must REPLACE that partial output (overwrite), not
    append to it — final corpus has no duplicate and no phantom keys.
    """
    from radio_data_pipeline_spark.streaming.events import (
        stream_to_training_shards,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "shards")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, text string"

    def add_file(name, lo, hi):
        spark.createDataFrame(
            [(i, f"doc-{i}") for i in range(lo, hi)], schema
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "*")).schema
        ).parquet(str(src / "*"))
        q = stream_to_training_shards(stream, out, key_col="doc_id",
                                      n_shards=4, checkpoint=cp)
        q.awaitTermination()

    # batch 0: committed cleanly
    add_file("f1", 0, 50)
    run()

    # batch 1 "crashes mid-write": the source file exists, the output
    # dir holds a PARTIAL write (a subset plus rows that the retry
    # would produce again), but the checkpoint never committed batch 1
    add_file("f2", 50, 100)
    partial = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(50, 70)], schema)
    from radio_data_pipeline_spark.sources.layout import shard_id
    (partial.withColumn("shard", shard_id("doc_id", 4))
     .write.mode("overwrite").partitionBy("shard")
     .parquet(f"{out}/batch=1"))

    # restart: batch 1 re-executes from the checkpointed offsets and
    # overwrites its own partial directory
    run()

    result = spark.read.parquet(out)
    keys = [r["doc_id"] for r in result.select("doc_id").collect()]
    assert sorted(keys) == list(range(100)), (
        f"dup/missing keys: {len(keys)} rows, "
        f"{len(set(keys))} distinct")
    # shard membership matches the batch writer's deterministic rule
    bad = result.withColumn("expect", shard_id("doc_id", 4)) \
        .filter(F.col("shard") != F.col("expect")).count()
    assert bad == 0


def test_constraint_gate_routes_bad_batches_to_quarantine(spark, tmp_path):
    """The streaming quality gate (streaming/events.py): a clean batch
    lands in good/, a rule-violating batch lands WHOLE in quarantine/
    with its constraint report alongside — never admitted, never
    silently dropped."""
    from radio_data_pipeline_spark.functions.constraints import (
        in_range,
        not_null,
        unique,
    )
    from radio_data_pipeline_spark.streaming.events import (
        stream_with_constraint_gate,
    )

    src = tmp_path / "src"
    src.mkdir()
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, score double"
    rules = [not_null("score"), unique("doc_id"),
             in_range("score", 0.0, 1.0)]

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "*")).schema
        ).parquet(str(src / "*"))
        q = stream_with_constraint_gate(stream, rules, good, quar, cp)
        q.awaitTermination()

    # batch 0: clean
    spark.createDataFrame(
        [(i, i / 100.0) for i in range(50)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    run()
    assert spark.read.parquet(good).count() == 50
    import os
    assert not os.path.exists(quar)

    # batch 1: duplicate ids + out-of-range score -> quarantined whole
    spark.createDataFrame(
        [(1, 0.5), (1, 0.5), (2, 7.0)], schema
    ).coalesce(1).write.parquet(str(src / "f2"))
    run()
    assert spark.read.parquet(good).count() == 50  # nothing admitted
    quarantined = spark.read.parquet(f"{quar}/batch=1")
    assert quarantined.count() == 3
    # the quarantine root must stay readable as ONE parquet dataset
    # (the operator replay) even with the report present: reports live
    # under an underscore dir Spark's file index ignores
    assert spark.read.parquet(quar).count() == 3
    report = spark.read.json(f"{quar}/_reports/batch=1").collect()[0]
    import json
    rows = {r["rule"]: r for r in json.loads(report["report"])}
    assert rows["unique(doc_id)"]["passed"] is False
    assert rows["in_range(score,0.0,1.0)"]["passed"] is False
    assert rows["not_null(score)"]["passed"] is True


def test_constraint_gate_verdict_flip_after_midbatch_crash(spark, tmp_path):
    """Crash-recovery proof for the quality gate (VERDICT r4 #7): a
    batch that died AFTER writing its verdict directory but BEFORE the
    checkpoint commit re-executes on restart — under a CHANGED rule
    set, so the verdict FLIPS. The batch must end up exactly once,
    under exactly one verdict, with the report consistent (present
    iff quarantined, and reflecting the CURRENT rules). Both flip
    directions are exercised."""
    import os

    from radio_data_pipeline_spark.functions.constraints import (
        in_range,
        not_null,
    )
    from radio_data_pipeline_spark.streaming.events import (
        stream_with_constraint_gate,
    )

    src = tmp_path / "src"
    src.mkdir()
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, score double"

    def run(rules):
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "*")).schema
        ).parquet(str(src / "*"))
        q = stream_with_constraint_gate(stream, rules, good, quar, cp)
        q.awaitTermination()

    lax = [not_null("score")]
    strict = [not_null("score"), in_range("score", 0.0, 1.0)]

    # batch 0: scores up to 4.9 — clean under lax, committed
    spark.createDataFrame(
        [(i, i / 10.0) for i in range(50)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    run(lax)
    assert spark.read.parquet(good).count() == 50

    # batch 1 data: passes lax, fails strict. Simulate the crashed
    # attempt: the LAX run wrote it to good/ and died before the
    # checkpoint committed (so the checkpoint still points at batch 1)
    batch1 = [(100 + i, 3.0 + i) for i in range(5)]
    spark.createDataFrame(batch1, schema) \
        .coalesce(1).write.parquet(str(src / "f2"))
    spark.createDataFrame(batch1, schema) \
        .write.mode("overwrite").parquet(f"{good}/batch=1")

    # restart with STRICT rules: verdict flips good -> quarantine
    run(strict)
    assert not os.path.exists(f"{good}/batch=1"), \
        "stale good/ copy must be removed on verdict flip"
    assert spark.read.parquet(good).count() == 50
    assert spark.read.parquet(f"{quar}/batch=1").count() == 5
    assert spark.read.parquet(quar).count() == 5
    import json
    rep = {r["rule"]: r for r in json.loads(
        spark.read.json(f"{quar}/_reports/batch=1").collect()[0]
        ["report"])}
    assert rep["in_range(score,0.0,1.0)"]["passed"] is False

    # batch 2 data: fails strict, passes lax. Simulate the crashed
    # STRICT attempt: quarantine copy + report written, no commit
    batch2 = [(200 + i, 2.0 + i) for i in range(4)]
    spark.createDataFrame(batch2, schema) \
        .coalesce(1).write.parquet(str(src / "f3"))
    spark.createDataFrame(batch2, schema) \
        .write.mode("overwrite").parquet(f"{quar}/batch=2")
    (spark.createDataFrame([(2, json.dumps([{
        "rule": "in_range(score,0.0,1.0)", "metric": 0.0,
        "threshold": 1.0, "passed": False}]))],
        "batch_id long, report string")
     .write.mode("overwrite").json(f"{quar}/_reports/batch=2"))

    # restart with LAX rules: verdict flips quarantine -> good
    run(lax)
    assert spark.read.parquet(f"{good}/batch=2").count() == 4
    assert not os.path.exists(f"{quar}/batch=2"), \
        "stale quarantine copy must be removed on verdict flip"
    assert not os.path.exists(f"{quar}/_reports/batch=2"), \
        "stale report must be removed when the batch is admitted"
    # batch 1 stays quarantined exactly once; totals consistent
    assert spark.read.parquet(quar).count() == 5
    assert spark.read.parquet(good).count() == 54

"""Structured Streaming surface over the events stream.

The reference is strictly batch per-file (SURVEY.md §2.8 — no
watermarks, windows, or stateful ops anywhere), so this module is the
engine's forward-looking ingest path: the same transformations accept a
batch OR a streaming DataFrame — watermarks are applied only when the
input is streaming, so every streaming query has an exactly-equivalent
batch form that the DuckDB oracles check (`events_tumbling_counts` in
plans/relational.py shares `tumbling_event_counts` below).

Scale notes:
- windowed aggregations keep state bounded by the watermark horizon
  (late rows beyond it are dropped), so a 1000-executor cluster holds
  O(windows-in-horizon × event_types) state, independent of history;
- `dedup_events` state is bounded the same way (event ids older than
  the watermark are evicted);
- session windows shuffle on user_id — high-cardinality, skew-free in
  the driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Historical events.parquet physical schema (ts = parquet
# TIMESTAMP(NANOS) read as a nanosecond LONG under
# spark.sql.legacy.parquet.nanosAsLong). Kept as the explicit-schema
# fallback when no file exists yet to probe; current driver data ships
# ts as timestamp[us], which read_events_stream detects by probing the
# footer of the files already present.
EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None,
                       ) -> DataFrame:
    """Streaming scan of events parquet (file source). `path` must be
    a directory (or glob) — the file source rejects a bare file path;
    new files under it become micro-batches. Columns come out exactly
    like the batch
    `load_table(..., "events")`: ts_ns (exact), ts_us, ts (micros
    timestamp used for event-time windows)."""
    from ..sources.parquet import derive_event_time_columns

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        # File streams need an explicit schema; probe the footers of
        # whatever files are already under `path` so both physical ts
        # encodings (nanos-as-long, timestamp[us]) work unchanged.
        schema = spark.read.parquet(path).schema
    except Exception:
        schema = EVENTS_RAW_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return derive_event_time_columns(reader.parquet(path))


def _with_watermark(events: DataFrame, watermark: str) -> DataFrame:
    # Batch DataFrames reject withWatermark; the transformations below
    # are defined for both so oracles can check the batch form.
    return events.withWatermark("ts", watermark) if events.isStreaming \
        else events


def tumbling_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregation: per (window, event_type)
    row count and value sum. Streaming: watermarked state, append-able.
    Returns (win_start_us, event_type, n_events, total_value)."""
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.unix_micros(F.col("win.start")).alias("win_start_us"),
                "event_type", "n_events", "total_value")
    )


def sliding_user_activity(events: DataFrame, window: str = "2 hours",
                          slide: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Sliding-window distinct-user activity; each event lands in
    window_duration/slide windows. Returns (win_start_us, n_users).

    Batch inputs count exactly. Streaming inputs use HLL++
    (``approx_count_distinct``, rsd=0.01) because Spark forbids exact
    distinct aggregation over streams — unbounded per-group value
    state; the sketch IS the production streaming answer (fixed-size
    mergeable state per window), and tests/test_streaming.py pins the
    stream result within the sketch's error bound of the exact batch
    count."""
    e = _with_watermark(events, watermark)
    n_users = (F.approx_count_distinct("user_id", rsd=0.01)
               if events.isStreaming else F.count_distinct("user_id"))
    return (
        e.groupBy(F.window("ts", window, slide).alias("win"))
        .agg(n_users.alias("n_users"))
        .select(F.unix_micros(F.col("win.start")).alias("win_start_us"),
                "n_users")
    )


def session_event_counts(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows per user (gap-based). The streaming
    analogue of the batch sessionization query (events_sessionize);
    state per open session, closed by the watermark."""
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id",
                F.unix_micros(F.col("win.start")).alias("session_start_us"),
                "n_events")
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state:
    dropDuplicatesWithinWatermark evicts ids once they age past the
    watermark. A plain dropDuplicates(["event_id"]) would keep ONE
    state entry per distinct id FOREVER — the watermark is inert for
    state cleanup unless the event-time column is in the subset or
    the WithinWatermark variant is used. Batch form degenerates to
    dropDuplicates."""
    e = _with_watermark(events, watermark)
    if not e.isStreaming:
        return e.dropDuplicates(["event_id"])
    return e.dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> DataFrame:
    """Test/driver helper: drain all currently-available input through
    the streaming query into an in-memory table and return it as a
    batch DataFrame. availableNow gives exactly-once over the files
    present at start, then stops — the batch-parity harness for every
    streaming op in this module."""
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def view_purchase_pairs(events: DataFrame, max_delay: str = "30 minutes",
                        watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: purchases within `max_delay` after a
    view by the same user (the conversion-attribution window). In
    streaming mode both sides carry watermarks and the time-band join
    condition bounds each side's state: a buffered view can be evicted
    once the purchase-side watermark passes view_ts + max_delay.
    Batch mode is the same join without watermarks — the aggregated
    form is the oracle-checked `events_view_purchase_attribution`
    (plans/pipeline_ops.py). Returns one row per qualifying
    (view, purchase) pair: (user_id, view_id, purchase_id, delay_s).
    """
    v = (events.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts")))
    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    if events.isStreaming:
        v = v.withWatermark("v_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        v.join(p, cond)
        .select(F.col("v_user").alias("user_id"), "view_id", "purchase_id",
                F.round((F.unix_micros("p_ts") - F.unix_micros("v_ts"))
                        / 1_000_000.0, 6).alias("delay_s"))
    )


def stream_to_training_shards(stream_df: DataFrame, path: str,
                              key_col: str, n_shards: int = 8,
                              checkpoint: str | None = None,
                              query_name: str = "to_shards"):
    """Streaming sink into the training-shard layout: every
    micro-batch is hash-assigned to ``shard=K/`` hive partitions with
    the SAME deterministic membership as the batch writer
    (sources/layout.shard_id), written exactly-once: each batch lands
    in its own ``batch=<id>/`` directory with mode('overwrite'), so a
    batch re-executed after a mid-write failure replaces its own
    partial output instead of appending duplicates (a blind append
    under foreachBatch is only at-least-once — the checkpoint prevents
    reprocessing committed batches, not re-execution of failed ones).
    Streams-in, training-shards-out — the live-ingest closing of the
    corpus pipeline: readers scan ``path`` (batch and shard are both
    hive partition columns) and a training reader still prunes to its
    shard at planning time. Returns the StreamingQuery (caller
    awaits). Requires ``checkpoint`` — see the guard below."""
    if checkpoint is None:
        # without a checkpoint a restarted query reuses batch ids from
        # 0 with DIFFERENT batch boundaries: some batch=N dirs get
        # overwritten, stale ones survive -> duplicated rows. The
        # exactly-once contract below only holds with a checkpoint.
        raise ValueError(
            "stream_to_training_shards requires a checkpoint location; "
            "the per-batch overwrite layout is only exactly-once under "
            "a checkpointed batch-id sequence")
    from ..sources.layout import shard_id

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("shard", shard_id(key_col, n_shards))
         .repartition(n_shards, F.col("shard"))
         .write.mode("overwrite").partitionBy("shard")
         .parquet(f"{path}/batch={batch_id}"))

    return (stream_df.writeStream.foreachBatch(write_batch)
            .queryName(query_name).trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start())


def _hadoop_rm(spark, path: str) -> None:
    """Recursive delete through Hadoop's FileSystem — correct for any
    scheme the DataFrame writer accepts (local, file:/, hdfs://,
    s3a://), unlike a local shutil.rmtree. Missing paths are a
    no-op."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(conf)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def stream_with_constraint_gate(stream_df: DataFrame, rules,
                                good_path: str, quarantine_path: str,
                                checkpoint: str,
                                query_name: str = "constraint_gate"):
    """Streaming ingest through the declarative quality gate
    (functions/constraints.py): every micro-batch is evaluated
    against `rules` in ONE aggregation pass; a batch where every rule
    passes lands under ``good_path``, a failing batch lands — whole,
    with its constraint report as JSON — under ``quarantine_path``
    (the dead-letter pattern: bad ingest is never silently admitted
    NOR silently dropped; an operator replays the quarantine after
    fixing the producer).

    Batch-granular by design: constraint metrics (uniqueness, volume
    floors, null fractions) are properties of a BATCH, not a row —
    row-level routing belongs to plain filters upstream. Exactly-once
    via the same per-batch overwrite layout as
    stream_to_training_shards (each batch owns batch=<id>/ under its
    verdict directory; re-execution after a crash replaces its own
    partial output).
    """
    import json as _json

    from ..functions.constraints import evaluate_constraints

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the batch feeds TWO actions (constraint aggregate + write);
        # without a persist each action re-reads the source files —
        # 2x I/O per batch, forever (round-4 review catch)
        batch_df.persist()
        try:
            report = evaluate_constraints(batch_df, rules).collect()
            ok = all(r["passed"] for r in report)
            dest = good_path if ok else quarantine_path
            other = quarantine_path if ok else good_path
            # a crash AFTER the write but BEFORE the checkpoint commit
            # re-executes this batch; if the rule set changed across
            # the restart the verdict can FLIP, so drop any copy the
            # failed attempt left under the other verdict directory —
            # otherwise the batch exists in both good/ and quarantine/
            # and a quarantine replay ingests it twice. Deletion goes
            # through the Hadoop FileSystem API so file:/, hdfs://,
            # s3a:// paths — everything the writer itself accepts —
            # are cleaned too (a local shutil.rmtree silently no-ops
            # on URIs, defeating the protection; round-4 review catch)
            spark = batch_df.sparkSession
            _hadoop_rm(spark, f"{other}/batch={batch_id}")
            _hadoop_rm(spark,
                       f"{quarantine_path}/_reports/batch={batch_id}")
            (batch_df.write.mode("overwrite")
             .parquet(f"{dest}/batch={batch_id}"))
            if not ok:
                # report travels with the quarantined data under an
                # underscore-prefixed dir, which Spark's file index
                # IGNORES — so spark.read.parquet(quarantine_path)
                # (the operator replay) still reads cleanly
                payload = _json.dumps([{
                    "rule": r["rule"], "metric": r["metric"],
                    "threshold": r["threshold"], "passed": r["passed"],
                } for r in report])
                (spark.createDataFrame([(batch_id, payload)],
                                       "batch_id long, report string")
                 .write.mode("overwrite")
                 .json(f"{quarantine_path}/_reports/batch={batch_id}"))
        finally:
            batch_df.unpersist()

    return (stream_df.writeStream.foreachBatch(write_batch)
            .queryName(query_name).trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start())

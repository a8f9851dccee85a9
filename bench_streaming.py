#!/usr/bin/env python
"""Streaming-path throughput bench (supplementary to bench.py):
drives the Structured Streaming surfaces end-to-end with availableNow
triggers over the driver's events table and prints ONE JSON line.

    python bench_streaming.py                 # sf0.1 events (~100k rows)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench_streaming.py

Measured surfaces:
- tumbling_event_counts: watermarked windowed aggregation (update mode)
- dedup_events: dropDuplicatesWithinWatermark
- stream_to_training_shards: the exactly-once hash-sharded sink
  (includes real parquet writes — the honest ingest number)

Each number is wall-clock for the FULL availableNow run (source
listing, all micro-batches, sink commit) on a fresh checkpoint —
the cold-start ingest cost a production deployment pays per restart,
amortized across the batches the trigger processes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from radio_data_pipeline_spark.session import get_spark
    from radio_data_pipeline_spark.sources.parquet import load_table
    from radio_data_pipeline_spark.streaming import (
        dedup_events,
        stream_to_training_shards,
        tumbling_event_counts,
    )

    spark = get_spark("rdps-streaming-bench")
    work = tempfile.mkdtemp(prefix="rdps_stream_bench_")
    results: dict[str, float] = {}
    try:
        # materialize the events table once as the stream source dir
        src = f"{work}/src"
        ev = load_table(spark, SF_DIR, "events")
        ev.write.parquet(src)
        materialized = spark.read.parquet(src)
        n_rows = materialized.count()
        schema = materialized.schema

        def stream():
            return spark.readStream.schema(schema).parquet(src)

        t0 = time.perf_counter()
        q = (tumbling_event_counts(stream())
             .writeStream.format("noop").outputMode("update")
             .option("checkpointLocation", f"{work}/cp_tumbling")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        results["tumbling_counts"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        q = (dedup_events(stream())
             .writeStream.format("noop").outputMode("append")
             .option("checkpointLocation", f"{work}/cp_dedup")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        results["dedup"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        q = stream_to_training_shards(
            stream().withColumn("doc_id", F.col("event_id")),
            f"{work}/shards", key_col="doc_id", n_shards=8,
            checkpoint=f"{work}/cp_shards")
        q.awaitTermination()
        results["training_shards_sink"] = round(
            time.perf_counter() - t0, 3)
        shard_rows = spark.read.parquet(f"{work}/shards").count()
        assert shard_rows == n_rows, (shard_rows, n_rows)

        total = round(sum(results.values()), 3)
        print(json.dumps({
            "metric": "streaming_available_now_wall_clock",
            "value": total, "unit": "sec", "queries": results,
            "input_rows": n_rows,
            "rows_per_sec_sink": round(
                n_rows / results["training_shards_sink"], 1),
            "sf_dir": SF_DIR,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

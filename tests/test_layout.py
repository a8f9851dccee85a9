"""Dataset-layout sinks: partition pruning must be visible in the
reader's physical plan, shard membership must be deterministic."""

from __future__ import annotations

import glob

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

"""fan_out / load_table_fanned: the input-size-adaptive repartition
must fire on starved scans and be a NO-OP when the input already
parallelizes — the property that keeps the 100 TB plan shuffle-free.
"""

from __future__ import annotations

from radio_data_pipeline_spark.sources.parquet import fan_out


def test_fan_out_repartitions_starved_input(spark):
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(1000).coalesce(1)
    out = fan_out(df, spark)
    assert out.rdd.getNumPartitions() == cores
    assert out.count() == 1000


def test_fan_out_noop_on_parallel_input(spark):
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(cores)
    out = fan_out(df, spark)
    # same object back — no extra exchange in the plan
    assert out is df


def test_fanned_loader_results_unchanged(spark, sf_dir):
    from radio_data_pipeline_spark.sources.parquet import (
        load_table,
        load_table_fanned,
    )
    plain = load_table(spark, sf_dir, "documents").select("doc_id")
    fanned = load_table_fanned(spark, sf_dir, "documents").select("doc_id")
    assert sorted(r.doc_id for r in plain.collect()) == \
        sorted(r.doc_id for r in fanned.collect())

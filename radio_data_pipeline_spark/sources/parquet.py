"""Parquet sources for the driver-provided synthetic tables.

Reference analogue: the FITS scan S1 (reference validate.py:18-23)
opens one observation file eagerly; here a scan is a lazy
``spark.read.parquet`` whose filters and column pruning reach the
parquet reader via Catalyst (PushedFilters / ReadSchema — verified in
tests/test_plans_explain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) with real sub-microsecond
        # precision. Spark's TimestampType is microseconds, so reading it
        # as a timestamp would silently truncate; instead read the raw
        # nanosecond LONG (ts_ns) — queries do exact integer time math
        # that DuckDB mirrors with epoch_ns(ts). A micro-truncated
        # TimestampType ts column is derived for interval-style uses.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return (df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts", F.timestamp_micros(F.col("ts_us"))))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}

"""Bucketed storage layout — the co-located-join path for 100 TB.

A fact table bucketed by its join key joins another table bucketed the
same way with ZERO shuffle: each task reads matching bucket files from
both sides. This is the layout decision that turns the biggest
recurring cost at scale (the orders<->lineitem class of joins) into a
map-side merge; tests/test_bucketed.py asserts the no-Exchange plan.

Spark persists bucket metadata in the session catalog
(saveAsTable), so bucketed tables live under spark.sql.warehouse.dir;
sortedness within buckets additionally removes the sort from
sort-merge joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 16,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed (optionally sorted) parquet table in
    the session catalog. n_buckets must match across tables meant to
    join shuffle-free; pick it so one bucket of the largest table fits
    an executor task (~hundreds of MB)."""
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str,
                        ) -> tuple[DataFrame, DataFrame]:
    """Load two catalog tables previously written with write_bucketed;
    joining them on their bucket columns produces a plan with no
    Exchange on either side (asserted in tests)."""
    return spark.table(left), spark.table(right)

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in radio_data_pipeline_spark/plans/ — each registered
once with both its Spark implementation and its DuckDB oracle so the
two cannot drift (see plans/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The aggregation spine of the engine (reference A1/A4 analogue):
    grouped pricing summary with predicate pushdown.
    """
    from radio_data_pipeline_spark.plans.registry import all_queries
    return all_queries()["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from radio_data_pipeline_spark.plans.registry import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from radio_data_pipeline_spark.plans.registry import all_oracle_sql
    return all_oracle_sql()

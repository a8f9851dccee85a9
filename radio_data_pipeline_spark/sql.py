"""ANSI-SQL entry point: register the lake's tables as temp views and
run raw SQL against them.

The engine is DataFrame-first (plans/ declares every query through the
DataFrame API so Catalyst sees the same logical plans), but users
coming from a SQL warehouse — or from the DuckDB oracles in this very
repo — should be able to paste their SQL unchanged. ``register_views``
exposes every driver table (plus the derived event-time columns the
loaders add, so ``ts_us``/``ts_ns`` work in SQL exactly as they do in
the DataFrame API), and ``sql`` is then just ``spark.sql`` — the
queries compile to the SAME Catalyst plans as the DataFrame forms, so
every plan-shape property pinned in tests/test_plans_explain.py
(pushdown, pruning, broadcasts, partial aggs) holds for SQL users too;
tests/test_sql_surface.py proves DataFrame/SQL plan equivalence on
representative queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from radio_data_pipeline_spark.sources.parquet import load_table

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register each lake table as a temp view named after itself.

    Views are lazy logical plans over the parquet scans — nothing is
    read or cached here, and filter/column pushdown through a view is
    identical to pushdown through the DataFrame reference.
    """
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI-SQL query against the lake (registers views
    first). Convenience wrapper; long-lived sessions should call
    ``register_views`` once and ``spark.sql`` directly."""
    register_views(spark, sf_dir)
    return spark.sql(query)

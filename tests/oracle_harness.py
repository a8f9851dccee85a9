"""Local replica of the driver's DuckDB-oracle correctness gate:
run the Spark query and the oracle SQL on the same parquet tables and
compare row count, schema (column names), and an order-insensitive
value comparison (sorted rows, exact equality after the queries' own
rounding)."""

from __future__ import annotations

import math

import duckdb

from radio_data_pipeline_spark.sources.parquet import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and collapse representations
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:  # pragma: no cover
        pass
    return repr(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            ) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    # free any build-time persisted intermediates the query deferred
    # (global-rank builders) — the harness-level release hook that
    # lets registered queries stay LAZY (r7 ADVICE)
    from radio_data_pipeline_spark.plans.registry import (
        release_deferred)
    release_deferred()
    spark_cols = spark_df.columns
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
        "rows_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "values_match": False,
        "first_diff": None,
    }
    if result["rows_match"] and result["cols_match"]:
        a = normalize_rows(spark_cols, spark_rows)
        b = normalize_rows(duck_cols, duck_rows)
        result["values_match"] = a == b
        if not result["values_match"]:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    result["first_diff"] = {"idx": i, "spark": x, "duck": y}
                    break
    return result

"""SQL entry point: raw ANSI SQL over the registered views must return
the same results — and compile to the same physical plan shapes — as
the DataFrame-API queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from radio_data_pipeline_spark.plans.registry import all_specs
from radio_data_pipeline_spark.sql import register_views, sql

_SPECS = all_specs()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_matches_dataframe_q1(spark, sf_dir):
    got = sql(spark, sf_dir, """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= date'1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)
    exp = _SPECS["q1_pricing_summary"].fn(spark, sf_dir) \
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_sql_join_gets_same_broadcast_plan(spark, sf_dir):
    register_views(spark, sf_dir)
    q = spark.sql("""
        SELECT n_name, round(sum(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC
    """)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # the tiny nation dimension must broadcast for SQL users exactly
    # as it does in the DataFrame plans
    assert "BroadcastHashJoin" in plan
    assert q.count() > 0


def test_sql_views_push_filters_into_scan(spark, sf_dir):
    register_views(spark, sf_dir)
    q = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderdate < date'1993-01-01'")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" \
        in plan


def test_sql_event_time_columns_available(spark, sf_dir):
    # the loader-derived ts_us/ts_ns columns must exist in SQL land
    got = sql(spark, sf_dir, """
        SELECT count(*) AS n FROM events WHERE ts_us > 0 AND ts_ns > 0
    """).first()["n"]
    exp = _SPECS["events_running_sum"].fn(spark, sf_dir).count()
    assert got == exp > 0


def test_udaf_iqr_skips_nulls_like_quantile_cont(spark, tmp_path):
    """ADVICE r3 (medium): NULL values must be SKIPPED by the IQR
    UDAF, matching SQL quantile_cont — not propagated to NaN by
    np.percentile. Pin it with a NULL-bearing events source run
    through the registered query AND its DuckDB oracle."""
    import duckdb

    con = duckdb.connect()
    d = str(tmp_path)
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            (1, TIMESTAMP '2024-01-01', 1, 'click',  1.0, ''),
            (2, TIMESTAMP '2024-01-01', 1, 'click',  2.0, ''),
            (3, TIMESTAMP '2024-01-01', 1, 'click',  3.0, ''),
            (4, TIMESTAMP '2024-01-01', 1, 'click',  NULL, ''),
            (5, TIMESTAMP '2024-01-01', 1, 'view',   NULL, ''),
            (6, TIMESTAMP '2024-01-01', 1, 'view',   NULL, ''),
            (7, TIMESTAMP '2024-01-01', 1, 'scroll', 5.0, ''),
            (8, TIMESTAMP '2024-01-01', 1, 'click',
             CAST('nan' AS DOUBLE), '')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    got = _SPECS["events_udaf_iqr_per_type"].fn(spark, d).collect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')")
    exp = con.execute(_SPECS["events_udaf_iqr_per_type"].oracle).fetchall()
    got_rows = sorted((r["event_type"], r["iqr"], r["n"]) for r in got)
    assert got_rows == sorted(exp)
    # the all-NULL group must be NULL (not NaN), with n counting rows;
    # the click group carries a NULL AND a genuine NaN — both skipped
    # by the finite-values IQR definition, both counted by n
    by_type = {t: (i, n) for t, i, n in got_rows}
    assert by_type["view"] == (None, 2)
    assert by_type["click"] == (1.0, 5)

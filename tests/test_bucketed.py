"""Bucketed-layout tests: the co-located join must plan with no
shuffle on either side, and produce identical results to the plain
shuffled join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from radio_data_pipeline_spark.sources.bucketed import (
    bucketed_join_ready,
    write_bucketed,
)
from radio_data_pipeline_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert warehouse  # catalog-backed bucketing in effect
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o, li = bucketed_join_ready(spark, *bucketed_tables)
    # disable broadcast so the join strategy decision is about
    # bucketing, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (li.join(o, li.l_orderkey == o.o_orderkey)
                  .groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n")))
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    # no shuffle below the join: bucket layout feeds both sides
    assert "Exchange hashpartitioning(l_orderkey" not in join_part
    assert "Exchange hashpartitioning(o_orderkey" not in join_part


def test_bucketed_join_matches_shuffled_join(spark, sf_smoke,
                                             bucketed_tables):
    o, li = bucketed_join_ready(spark, *bucketed_tables)
    got = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
    plain_o = load_table(spark, sf_smoke, "orders")
    plain_li = load_table(spark, sf_smoke, "lineitem")
    exp = (plain_li.join(plain_o, plain_li.l_orderkey == plain_o.o_orderkey)
           .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))

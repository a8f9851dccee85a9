"""The local mirror of the driver's t2 correctness gate: every
registered query must hash-match its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from radio_data_pipeline_spark.plans.registry import all_specs
from tests.oracle_harness import compare, duck_connection

_SPECS = all_specs()
_WITH_ORACLE = [name for name, s in _SPECS.items() if s.oracle is not None]
_NO_ORACLE = [name for name, s in _SPECS.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    result = compare(df, duck, spec.oracle)
    assert result["rows_match"], f"{name}: row counts {result}"
    assert result["cols_match"], f"{name}: columns {result}"
    assert result["values_match"], f"{name}: values differ {result['first_diff']}"


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_query_without_oracle_runs(spark, sf_dir, name):
    from radio_data_pipeline_spark.plans.registry import release_deferred
    df = _SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    release_deferred()


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    # the approx scale path (HLL++ distinct, t-digest percentile) must
    # land within its documented error of the exact values
    from pyspark.sql import functions as F
    from radio_data_pipeline_spark.sources.parquet import load_table
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
    ).first()
    assert abs(row["approx_users"] - row["exact_users"]) \
        <= max(3, 0.05 * row["exact_users"])
    assert abs(row["approx_p50"] - row["exact_p50"]) \
        <= 0.02 * max(abs(row["exact_p50"]), 1.0)

"""Constraint-engine unit tests: exact metrics on a crafted frame and
the one-pass plan property (every rule aggregates over ONE scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.constraints import (
    evaluate_constraints,
    in_range,
    in_set,
    matches,
    min_rows,
    not_null,
    unique,
)


def _frame(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a", "x1"),
         (2, -5.0, "b", "x2"),
         (2, None, "c", "zz"),   # dup id, NULL value, bad code
         (4, 50.0, None, "x4")],  # NULL cat
        "id long, v double, cat string, code string")


def test_metrics_exact(spark):
    rows = {r["rule"]: r for r in evaluate_constraints(_frame(spark), [
        not_null("v"),                       # 3/4
        unique("id"),                        # 3 distinct / 4
        in_range("v", 0.0, 100.0),           # 2 of 3 non-null
        in_set("cat", ["a", "b"]),           # 2 of 3 non-null
        matches("code", "^x"),               # 3 of 4 non-null
        min_rows(2),                         # 4/2 capped at 1.0
        min_rows(8),                         # 4/8 = 0.5 -> fails
    ]).collect()}
    assert rows["not_null(v)"]["metric"] == 0.75
    assert rows["unique(id)"]["metric"] == 0.75
    assert abs(rows["in_range(v,0.0,100.0)"]["metric"] - 2 / 3) < 1e-6
    assert abs(rows["in_set(cat,['a', 'b'])"]["metric"] - 2 / 3) < 1e-6
    assert rows["matches(code,^x)"]["metric"] == 0.75
    assert rows["min_rows(2)"]["metric"] == 1.0
    assert rows["min_rows(2)"]["passed"] is True
    assert rows["min_rows(8)"]["metric"] == 0.5
    assert rows["min_rows(8)"]["passed"] is False


def test_all_rules_share_one_scan(spark):
    """The 100 TB contract: N rules != N jobs. Every rule's aggregate
    must ride ONE scan of the input — the optimized plan contains
    exactly one scan node even with a distinct-based rule mixed in."""
    report = evaluate_constraints(_frame(spark), [
        not_null("v"), unique("id"), in_range("v", 0, 100),
        min_rows(2)])
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    scans = (plan.count("LogicalRDD") + plan.count("LocalRelation")
             + plan.count("Relation ["))
    assert scans == 1, plan
    assert plan.count("Aggregate") == 1, plan


def test_empty_input(spark):
    df = _frame(spark).limit(0)
    rows = {r["rule"]: r for r in evaluate_constraints(df, [
        not_null("v"), in_range("v", 0, 1), min_rows(1)]).collect()}
    # avg over zero rows is NULL -> metric NULL -> passed must be
    # False (coalesced), never None
    assert rows["not_null(v)"]["passed"] is False
    assert rows["min_rows(1)"]["metric"] == 0.0
    assert rows["min_rows(1)"]["passed"] is False
    assert rows["in_range(v,0,1)"]["metric"] == 1.0  # vacuous


def test_profile_columns_exact_and_one_pass(spark):
    from radio_data_pipeline_spark.functions.constraints import (
        profile_columns,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (9, "a")],
        "id long, cat string")
    rows = {r["column"]: r for r in
            profile_columns(df, ["id", "cat"]).collect()}
    assert rows["id"]["non_null_frac"] == 1.0
    assert rows["id"]["n_distinct"] == 3
    assert rows["id"]["min_str"] == "1" and rows["id"]["max_str"] == "9"
    assert rows["cat"]["non_null_frac"] == 0.75
    assert rows["cat"]["n_distinct"] == 2
    assert rows["cat"]["min_str"] == "a" and rows["cat"]["max_str"] == "b"
    plan = profile_columns(df, ["id", "cat"]) \
        ._jdf.queryExecution().optimizedPlan().toString()
    scans = (plan.count("LogicalRDD") + plan.count("LocalRelation")
             + plan.count("Relation ["))
    assert scans == 1, plan


def test_threshold_compares_unrounded_metric(spark):
    """One NULL in 2,000,001 rows: metric displays as 1.0 (6-decimal
    rounding) but the gate must still FAIL a threshold=1.0
    completeness rule — pass/fail compares the raw aggregate, not the
    display value (round-4 review repro: rounding-first admitted the
    violation)."""
    df = spark.range(2_000_001).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id"))
        .alias("v"))
    row = evaluate_constraints(df, [not_null("v")]).collect()[0]
    assert row["metric"] == 1.0          # display rounds up
    assert row["passed"] is False        # the gate does not


def test_empty_rules_and_cols_raise_clear_errors(spark):
    """Zero rules/cols must raise a clear ValueError, not fall into
    df.agg() with no expressions (opaque Spark error; r4 ADVICE)."""
    import pytest

    from radio_data_pipeline_spark.functions.constraints import (
        profile_columns,
    )

    df = _frame(spark)
    with pytest.raises(ValueError, match="non-empty"):
        evaluate_constraints(df, [])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])


def test_in_set_names_cannot_collide(spark):
    """Values containing ',' or ']' must produce distinct report keys
    (repr-embedded): ['a,b'] vs ['a','b'] are different rules."""
    df = _frame(spark)
    rows = evaluate_constraints(df, [
        in_set("cat", ["a,b"]),
        in_set("cat", ["a", "b"]),
    ]).collect()
    names = [r["rule"] for r in rows]
    assert len(set(names)) == 2
    by = {r["rule"]: r["metric"] for r in rows}
    assert abs(by["in_set(cat,['a', 'b'])"] - 2 / 3) < 1e-6
    assert by["in_set(cat,['a,b'])"] < 0.5  # no literal 'a,b' value

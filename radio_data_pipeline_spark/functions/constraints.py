"""Declarative data-quality constraints evaluated in ONE aggregation
pass — the pre-ingest validation gate a training-data pipeline runs
before a corpus (or a day's ingest) is admitted (the generalization of
the reference's per-column physicality checks, validate.py:104-127,
to a reusable rule engine; same role as AWS Deequ / Great
Expectations checks, re-expressed as a single Spark aggregate).

Design for 100 TB:
- EVERY rule compiles to an aggregate expression over the same scan —
  one job, one pass, no per-rule actions. A 50-rule suite on a 100 TB
  table costs the same scan as one count().
- ``unique`` rules use count_distinct in the same Aggregate node
  (Spark plans multiple distinct aggregates via expand, still one
  pass over the scan).
- The report is assembled executor-side from the single aggregate row
  via an inline array -> explode, so the driver never sees data, only
  the one-row aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint: `name` labels the report row; `metric_expr`
    aggregates to a DOUBLE in [0, 1] (fraction satisfied) or any
    scalar; `threshold` is the minimum passing value."""
    name: str
    metric: Column
    threshold: float


def not_null(col: str, threshold: float = 1.0) -> Rule:
    """Fraction of rows with a non-NULL value."""
    return Rule(
        f"not_null({col})",
        F.avg(F.col(col).isNotNull().cast("double")),
        threshold)


def unique(col: str, threshold: float = 1.0) -> Rule:
    """distinct/total ratio (1.0 = fully unique). NULLs count toward
    total but not distinct, matching SQL COUNT(DISTINCT)."""
    return Rule(
        f"unique({col})",
        F.count_distinct(F.col(col)).cast("double")
        / F.count(F.lit(1)),
        threshold)


def in_range(col: str, lo: float, hi: float,
             threshold: float = 1.0) -> Rule:
    """Fraction of non-NULL values inside [lo, hi]; NULLs are
    excluded from the denominator (pair with not_null to bound
    them)."""
    c = F.col(col)
    ok = ((c >= lo) & (c <= hi)).cast("double")
    return Rule(
        f"in_range({col},{lo},{hi})",
        F.coalesce(F.avg(F.when(c.isNotNull(), ok)), F.lit(1.0)),
        threshold)


def in_set(col: str, values: list, threshold: float = 1.0) -> Rule:
    """Fraction of non-NULL values in the allowed set. The rule name
    embeds repr(values) (like in_range embeds its bounds) so two
    in_set rules on one column never collide in the report — repr,
    not str-join, because a value containing ',' or ']' would
    otherwise produce colliding/ambiguous report keys."""
    c = F.col(col)
    ok = c.isin(values).cast("double")
    return Rule(
        f"in_set({col},{values!r})",
        F.coalesce(F.avg(F.when(c.isNotNull(), ok)), F.lit(1.0)),
        threshold)


def matches(col: str, pattern: str, threshold: float = 1.0) -> Rule:
    """Fraction of non-NULL values matching the regex; the pattern is
    part of the rule name (report-key uniqueness)."""
    c = F.col(col)
    ok = c.rlike(pattern).cast("double")
    return Rule(
        f"matches({col},{pattern})",
        F.coalesce(F.avg(F.when(c.isNotNull(), ok)), F.lit(1.0)),
        threshold)


def min_rows(n: int) -> Rule:
    """Row-count floor, reported as count/n capped at 1.0 so the
    metric shares the [0, 1] scale."""
    return Rule(
        f"min_rows({n})",
        F.least(F.count(F.lit(1)).cast("double") / float(n),
                F.lit(1.0)),
        1.0)


def evaluate_constraints(df: DataFrame, rules: list[Rule],
                         round_to: int = 6) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass.

    Returns (rule STRING, metric DOUBLE, threshold DOUBLE,
    passed BOOLEAN), one row per rule, in rule order.

    pass/fail compares the UNROUNDED metric — rounding first would
    mask violations smaller than half an ulp of the display
    precision (verified: one NULL in 2M rows rounds to metric 1.0
    and would sail through a threshold=1.0 completeness gate; round-4
    review catch). `metric` in the report is rounded for display
    only. A NULL metric (empty input, all-NULL column) FAILS:
    passed coalesces to False, never NULL."""
    if not rules:
        raise ValueError(
            "evaluate_constraints: rules must be non-empty — "
            "df.agg() with zero expressions is not a report")
    agg = df.agg(*[
        r.metric.cast("double").alias(f"_m{i}")
        for i, r in enumerate(rules)])
    report = F.array(*[
        F.struct(
            F.lit(r.name).alias("rule"),
            F.round(F.col(f"_m{i}"), round_to).alias("metric"),
            F.lit(float(r.threshold)).alias("threshold"),
            F.coalesce(
                F.col(f"_m{i}") >= F.lit(float(r.threshold)),
                F.lit(False)).alias("passed"))
        for i, r in enumerate(rules)])
    return (agg.select(F.explode(report).alias("r"))
            .select("r.rule", "r.metric", "r.threshold", "r.passed"))


def profile_columns(df: DataFrame, cols: list[str],
                    round_to: int = 6) -> DataFrame:
    """One-pass column profile — the first-look diagnostic on any new
    table (null fraction, cardinality, bounds per column), sharing the
    constraint engine's design: every statistic is an aggregate over
    ONE scan, the report explodes executor-side from the single
    aggregate row.

    n_distinct is exact count_distinct here (oracle-checkable); at
    100 TB swap approx_count_distinct into the same Aggregate — the
    plan shape is identical and the scan count stays 1.

    Returns (column STRING, non_null_frac DOUBLE, n_distinct BIGINT,
    min_str STRING, max_str STRING)."""
    if not cols:
        raise ValueError(
            "profile_columns: cols must be non-empty — "
            "df.agg() with zero expressions is not a profile")
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.round(F.avg(col.isNotNull().cast("double")), round_to)
            .alias(f"_n{i}"),
            F.count_distinct(col).alias(f"_d{i}"),
            F.min(col).cast("string").alias(f"_lo{i}"),
            F.max(col).cast("string").alias(f"_hi{i}"),
        ]
    agg = df.agg(*aggs)
    report = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_n{i}").alias("non_null_frac"),
            F.col(f"_d{i}").alias("n_distinct"),
            F.col(f"_lo{i}").alias("min_str"),
            F.col(f"_hi{i}").alias("max_str"))
        for i, c in enumerate(cols)])
    return (agg.select(F.explode(report).alias("r"))
            .select("r.column", "r.non_null_frac", "r.n_distinct",
                    "r.min_str", "r.max_str"))

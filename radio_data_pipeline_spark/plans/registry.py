"""Query registry: one place where every engine query is declared with
its DuckDB oracle, so the driver contract (__spark_entry__.queries /
oracle_sql) and the local parity tests can never drift apart.

Parity rules (enforced by convention in every spec):
- every computed column is aliased identically in Spark and SQL;
- float outputs are rounded the same way on both sides (aggregates of
  large float sums -> 2 decimals; ratios/means/math -> 6);
- integer-like aggregates are cast to BIGINT in the oracle because
  DuckDB widens SUM(int) to HUGEINT while Spark uses LONG;
- timestamps leave the query as epoch seconds via floor() semantics on
  both sides (Spark CAST(ts AS LONG) truncates; DuckDB uses
  CAST(floor(epoch(ts)) AS BIGINT)).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc,
                                    tags=tags)
        return fn
    return deco


def _load_all_modules() -> None:
    # Import side-effect registration; kept lazy so `import
    # radio_data_pipeline_spark` stays cheap.
    # ORDER MATTERS for the driver's correctness sample: registration
    # order is dict order, and the SURVEY §2-critical families (the
    # radio hard core, then arrays/relational) must land inside the
    # driver's query-sample window — hence radio first.
    from radio_data_pipeline_spark.plans import radio  # noqa: F401
    from radio_data_pipeline_spark.plans import arrays  # noqa: F401
    from radio_data_pipeline_spark.plans import relational  # noqa: F401
    from radio_data_pipeline_spark.plans import multimodal  # noqa: F401
    from radio_data_pipeline_spark.plans import llm  # noqa: F401
    from radio_data_pipeline_spark.plans import quality  # noqa: F401
    from radio_data_pipeline_spark.plans import curation  # noqa: F401
    from radio_data_pipeline_spark.plans import graph  # noqa: F401
    from radio_data_pipeline_spark.plans import pipeline_ops  # noqa: F401
    from radio_data_pipeline_spark.plans import training_data  # noqa: F401
    from radio_data_pipeline_spark.plans import analytics_extra  # noqa: F401
    from radio_data_pipeline_spark.plans import streaming_batch  # noqa: F401
    from radio_data_pipeline_spark.plans import tpch_extra  # noqa: F401
    from radio_data_pipeline_spark.plans import search_text  # noqa: F401
    from radio_data_pipeline_spark.plans import timeseries_extra  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items()
            if spec.oracle is not None}

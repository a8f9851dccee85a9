"""Driver-contract smoke tests (mirrors the driver's t1 check)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 30
    # every oracle key must have a query
    assert set(o).issubset(set(q))
    # every query is oracle-checked EXCEPT genuinely non-SQL ops
    # (mapInPandas decode stubs), which the driver contract records as
    # rows-only checks — each must be explicitly tagged
    from radio_data_pipeline_spark.plans.registry import all_specs
    specs = all_specs()
    for name in set(q) - set(o):
        assert {"mapInPandas", "multimodal", "radio"} \
               & set(specs[name].tags), \
               f"{name} lacks an oracle but is not a tagged non-SQL op"

"""Observation merge — reference file_merge.py (SURVEY.md §2.3 A6).

The reference vstacks astropy Tables after asserting exact column-name
and dtype equality (file_merge.py:30-43) and keeps the first file's
header. Spark-side this is unionByName over N lazy scans — at 100 TB
a union of parquet datasets is metadata-only (no shuffle, no copy).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


class SchemaMismatchError(ValueError):
    pass


def merge_observations(dfs: list[DataFrame]) -> DataFrame:
    """unionByName with the reference's strict schema preconditions:
    same column names AND same types, else raise (file_merge.py:38-43
    raises ValueError)."""
    if not dfs:
        raise ValueError("merge_observations: need at least one DataFrame")
    first = dfs[0]
    ref = [(f.name, f.dataType) for f in first.schema.fields]
    for i, df in enumerate(dfs[1:], start=1):
        got = [(f.name, f.dataType) for f in df.schema.fields]
        if sorted(ref, key=lambda x: x[0]) != sorted(got, key=lambda x: x[0]):
            raise SchemaMismatchError(
                f"merge_observations: input {i} schema {got} != {ref}")
    return reduce(lambda a, b: a.unionByName(b), dfs)

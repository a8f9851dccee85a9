"""Sort-shape helpers: place the range exchange where its sampling
pass is cheap (round-11 optimization, guide §1.4/§2.4).

Spark's global sort (``orderBy``) plans an ``Exchange
rangepartitioning`` whose partition boundaries come from a SEPARATE
sampling job over the sort's child — and that job RE-EXECUTES the
child's whole stage (shuffle reads are reused, but any projection,
aggregation or window in the stage runs again). Measured with
tools/count_jobs.py at sf0.1: every orderBy-terminated query runs 2
driver jobs per execution, and for map-heavy queries (simhash, the
vector folds) the expensive kernel is computed twice per run. The
same double pass exists at 100 TB — it is a full extra pass over the
sort input, not a toy-scale artifact.

Two remedies, each keeping the output rows AND their order
bit-identical to the ``orderBy`` form:

- ``bounded_sort(df, *cols)`` — for outputs whose row count is
  bounded by a key domain (grouping over enum-like keys, a fixed
  array dimension, calendar buckets), not by input size. A
  single-partition range exchange: ``RangePartitioner(partitions=1)``
  builds no bounds, so there is NO sampling job, and the one sort
  task sees only the bounded output rows. The parallel aggregation
  upstream is untouched.

- range-partition EARLY (``load_table_fanned(..., range_cols=...)``
  in sources/parquet.py, or an explicit ``repartitionByRange`` on a
  window's partition key): when data is already range-partitioned by
  a prefix of the requested ordering, EnsureRequirements satisfies
  ``OrderedDistribution`` without a new exchange — the trailing
  ``orderBy`` compiles to a LOCAL sort, the sampling job only
  re-reads the cheap scan below the early exchange, and hash+range
  exchange pairs keyed on the same column collapse into one exchange
  (guide §2.4: two operations keyed the same way share one
  exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def bounded_sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Globally sort a KEY-DOMAIN-BOUNDED frame by ``cols`` without
    the range-boundary sampling job.

    Equivalence to ``df.orderBy(*cols)``: a range exchange into ONE
    partition sends every row to the same task (any ordering of one
    partition is the same partition), and ``sortWithinPartitions``
    over a single partition IS a total order — identical rows,
    identical order. ``RangePartitioner`` with ``partitions <= 1``
    skips boundary sampling entirely, so the child subtree executes
    exactly once per action instead of twice.

    ONLY for outputs bounded by construction (grouping keys drawn
    from a fixed domain, array positions of a fixed dimension,
    calendar buckets): the final sort runs in one task, which is the
    point — a handful of rows gathered once — and would be wrong for
    input-proportional outputs, which must keep the parallel
    range-partitioned sort."""
    return df.repartitionByRange(1, *cols).sortWithinPartitions(*cols)

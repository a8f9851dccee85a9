"""Parquet sources for the driver-provided synthetic tables.

Reference analogue: the FITS scan S1 (reference validate.py:18-23)
opens one observation file eagerly; here a scan is a lazy
``spark.read.parquet`` whose filters and column pruning reach the
parquet reader via Catalyst (PushedFilters / ReadSchema — verified in
tests/test_plans_explain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def derive_event_time_columns(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to three views regardless of
    the physical parquet type:

      ts_ns : nanosecond epoch LONG (exact integer time math; DuckDB
              mirrors it with ``epoch_ns(ts)``)
      ts_us : microsecond epoch LONG
      ts    : microsecond ``TimestampType`` (event-time windows)

    Two physical encodings exist across driver testdata generations:
    TIMESTAMP(NANOS) — which Spark reads as a nanosecond LONG under
    ``spark.sql.legacy.parquet.nanosAsLong`` — and plain
    ``timestamp[us]`` (TIMESTAMP_NTZ / TIMESTAMP). The session runs in
    UTC, so the NTZ→TZ cast is an identity relabel.
    """
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return (df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts", F.timestamp_micros(F.col("ts_us"))))
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (df.withColumn("ts_us", ts_us)
            .withColumn("ts_ns", ts_us * F.lit(1000))
            .withColumn("ts", F.col("ts").cast("timestamp")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the NTZ->timestamp cast in derive_event_time_columns reads
        # the session timezone; pin it so epochs match DuckDB's
        # (UTC-based) epoch_us on drivers whose system TZ isn't UTC
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return derive_event_time_columns(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def fan_out(df: DataFrame, spark: SparkSession,
            min_fraction: float = 0.5) -> DataFrame:
    """Input-size-adaptive fan-out for compute-heavy kernels.

    Parquet cannot split below row-group granularity: a small file is
    ONE scan task no matter how many cores exist, which serializes
    hash/regex kernels whose CPU cost is orders of magnitude above the
    bytes they read (e.g. SimHash hashes every word ~once per output
    bit-nibble). When the observed scan parallelism is below
    ``min_fraction * defaultParallelism``, round-robin repartition to
    the core count — shuffling the kilobytes is ~free relative to the
    kernel. At real scale (thousands of row groups / files) the
    condition is false and this is a no-op, so the 100 TB plan keeps
    its shuffle-free map shape.
    """
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(cores * min_fraction)):
        return df.repartition(cores)
    return df


_FAN_MEMO: dict[tuple[str, str], bool] = {}


def load_table_fanned(spark: SparkSession, sf_dir: str,
                      name: str, range_cols: tuple[str, ...] = (),
                      ) -> DataFrame:
    """``load_table`` + ``fan_out`` with the (scan-parallelism < cores)
    probe memoized per (sf_dir, table) — the physical split count of a
    static parquet table is stable within a session, and the probe
    costs one plan->RDD conversion we don't want on every query build.

    ``range_cols`` (round-11): fan out by RANGE on these columns
    instead of round-robin. Same parallelization of the downstream
    kernel, same shuffled bytes when the fan fires — but a consumer
    whose trailing ``orderBy`` starts with ``range_cols`` then needs
    NO second exchange (RangePartitioning satisfies
    OrderedDistribution for a prefix), so its global sort compiles to
    a local sort and the range-boundary sampling job re-reads only
    the scan below this exchange rather than re-running the expensive
    kernel stage (operators/ordering.py has the full argument;
    measured at sf0.1: simhash_docs noop wall −40%). When the fan
    does not fire (real scale: thousands of splits) the plan is
    byte-identical to before — the consumer's own orderBy inserts the
    range exchange over the NARROW kernel output, which is the right
    side to shuffle at 100 TB.
    """
    df = load_table(spark, sf_dir, name)
    key = (sf_dir, name)
    if key not in _FAN_MEMO:
        cores = spark.sparkContext.defaultParallelism
        _FAN_MEMO[key] = df.rdd.getNumPartitions() < max(1, cores // 2)
    if not _FAN_MEMO[key]:
        return df
    cores = spark.sparkContext.defaultParallelism
    if range_cols:
        return df.repartitionByRange(cores, *range_cols)
    return df.repartition(cores)


JOIN_STRATEGIES = ("broadcast", "merge", "shuffle_hash",
                   "shuffle_replicate_nl")


def join_with_strategy(left: DataFrame, right: DataFrame, on,
                       how: str = "inner",
                       strategy: str | None = None) -> DataFrame:
    """Join with an optional PER-JOIN physical-strategy hint — the
    narrow opt-in for the measured q5-class knob (BENCH_SCALING.md
    §10: on the 600 M-row shuffle-bound join, ShuffledHashJoin ran
    1.5-1.8x faster than SortMergeJoin, but `spark.sql.join.
    preferSortMergeJoin=false` is SESSION-wide and SHJ fails hard
    when a build partition outgrows memory, so flipping it globally
    trades every join's robustness for one join's speed).

    strategy=None (the default) is a PLAIN df.join — no hint, no
    plan change, Catalyst/AQE pick as always; tests pin that the
    default q5 plan is byte-identical in shape. Otherwise one of
    JOIN_STRATEGIES, applied as a Spark join hint on the RIGHT side
    (hints propagate through Catalyst and win over the cost-based
    pick for that one join only):

    - 'shuffle_hash': build a hash table of the right side per
      partition — skips BOTH sorts; the measured q5 win. Caller
      asserts the right side's partitions fit executor memory.
    - 'merge': force sort-merge (pin robustness where a future AQE
      version might choose SHJ).
    - 'broadcast': force broadcast of the right side past
      autoBroadcastJoinThreshold (caller asserts it fits).
    - 'shuffle_replicate_nl': cartesian-replicate NL join —
      almost never right; present for completeness.

    A deployment flips the measured knob per-join::

        join_with_strategy(lineitem, orders, on=..., strategy="shuffle_hash")
    """
    if strategy is not None:
        if strategy not in JOIN_STRATEGIES:
            raise ValueError(
                f"unknown join strategy {strategy!r}; "
                f"expected one of {JOIN_STRATEGIES} or None")
        right = right.hint(strategy)
    return left.join(right, on, how)

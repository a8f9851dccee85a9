"""Time-series wave 5: windowed exponential smoothing and
gaps-and-islands run analysis — the two classic sequential-state
workloads re-expressed as bounded relational plans.

No reference analogue beyond the general stateful-scan family
(utils.py's calibration state machine, which operators/segmentation.py
covers); these are SURVEY §2.8 driver-extension components for the
events/orders fact streams.

- **Windowed EWMA** (`ewma_daily_revenue`): time-aware exponential
  moving average of daily revenue with decay 0.9/day over a 30-day
  lookback. The textbook recursive EWMA is a sequential scan (state
  threads through every row — the one shape that cannot parallelize);
  the 30-tap FIR form computes the SAME weighted mean from a bounded
  band self-join (each day joins its <=30 predecessors), which is a
  range join Spark executes as an equi-join-free band with per-row
  state bounded by the window — embarrassingly parallel over days and
  exactly mirrored in SQL. Tail weight beyond 30 days is 0.9^30 < 5%
  and the truncation is part of the operator's definition, not an
  approximation the oracle forgives.
- **Gaps-and-islands** (`events_type_islands`): per-user runs of
  consecutive same-type events via the two-row_number difference
  trick — the standard sessionization-adjacent primitive (streak
  detection, state-dwell analysis). Two windows over the SAME
  (user_id, ts, event_id) sort order — one partitioning, the rows
  sort once — then two hash aggregations; ties are broken by
  event_id so the island labels are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table

_DECAY = 0.9
_LOOKBACK_DAYS = 29  # window = current day + 29 predecessors


def windowed_ewma(days: DataFrame, decay: float = _DECAY,
                  lookback: int = _LOOKBACK_DAYS) -> DataFrame:
    """Time-aware windowed EWMA over a ``(day DATE, rev DOUBLE)``
    series: each day's smoothed value is the decay-weighted mean of
    its value and up to ``lookback`` calendar-day predecessors
    (weight decay**gap_days — calendar-aware, so data gaps decay by
    elapsed time, not by row count). Exposed separately so property
    tests can drive it with arbitrary series against a NumPy
    reference.

    Plan shape (round-4 rewrite): the naive band self-join
    (day2 BETWEEN day1-lookback AND day1) has no equi key, so Spark
    executes it as a CartesianProduct — measured 12.2 s at the 100x
    corpus (BENCH_SCALING.md §9) because P_left x P_right task pairs
    each rescan both sides. Instead each source day EXPLODES into its
    <= lookback+1 future target days (sequence + date_add) and the
    band becomes a pure equi hash join on the day key — O(days x
    lookback) rows, linear in day count, broadcast-joined against the
    day table (bounded: decades of days is ~10k rows). Pair set is
    identical: gap in [0, lookback] and day1 = day2 + gap."""
    d1 = days.select(F.col("day").alias("day1"), F.col("rev").alias("rev1"))
    taps = (
        days.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
        .select("day2", "rev2",
                F.explode(F.sequence(F.lit(0), F.lit(int(lookback))))
                .alias("gap"))
        .select(F.date_add(F.col("day2"), F.col("gap")).alias("day1"),
                "rev2", "gap")
    )
    w = F.pow(F.lit(decay), F.col("gap"))
    return (
        taps.join(F.broadcast(d1), "day1")
        .groupBy(F.col("day1").alias("day"), F.col("rev1"))
        .agg((F.sum(F.col("rev2") * w) / F.sum(w)).alias("e"))
        .select("day", F.round("rev1", 2).alias("revenue"),
                F.round("e", 4).alias("ewma"))
        .orderBy("day")
    )


def type_islands(ev: DataFrame) -> DataFrame:
    """Gaps-and-islands run statistics over ``(user_id, event_type,
    event_id, ts_us)`` rows — the two-row_number difference trick,
    reduced to per-type run stats. Exposed separately for the
    property battery (random event sequences vs a pure-Python
    run-length reference)."""
    w1 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w2 = (Window.partitionBy("user_id", "event_type")
          .orderBy("ts_us", "event_id"))
    runs = (
        ev.select("user_id", "event_type", "event_id",
                  (F.row_number().over(w1)
                   - F.row_number().over(w2)).alias("grp"))
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"),
             F.max("run_len").cast("bigint").alias("max_run"),
             F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0))
             .cast("bigint").alias("runs_ge3"),
             F.round(F.avg("run_len"), 6).alias("avg_run"))
        .transform(bounded_sort, "event_type")
    )


@register(
    "ewma_daily_revenue",
    oracle=f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT d1.day,
           round(d1.rev, 2) AS revenue,
           round(sum(d2.rev * pow({_DECAY},
                                  date_diff('day', d2.day, d1.day)))
                 / sum(pow({_DECAY}, date_diff('day', d2.day, d1.day))),
                 4) AS ewma
    FROM d d1 JOIN d d2
      ON d2.day BETWEEN d1.day - {_LOOKBACK_DAYS} AND d1.day
    GROUP BY d1.day, d1.rev
    ORDER BY d1.day
    """,
    doc="Time-aware EWMA (decay 0.9/day, 30-day lookback) of daily "
        "order revenue as a bounded band self-join: the recursive "
        "EWMA's sequential state is re-expressed as a <=30-row "
        "weighted mean per day, so the plan is a range join + "
        "aggregation that parallelizes over days instead of a scan "
        "that cannot. Day facts reduce first (one date aggregation), "
        "so the band join runs on the ~day-count table, never raw "
        "orders; the 30-tap truncation is the operator's definition "
        "(tail weight < 5%), identical in both engines.",
    tags=("timeseries", "window", "smoothing", "range-join"),
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = (orders.groupBy(F.to_date("o_orderdate").alias("day"))
         .agg(F.sum("o_totalprice").alias("rev")))
    return windowed_ewma(d)


@register(
    "events_type_islands",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn1,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts), event_id) AS rn2
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, rn1 - rn2 AS grp,
             CAST(count(*) AS BIGINT) AS run_len
      FROM e GROUP BY user_id, event_type, rn1 - rn2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run,
           CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS runs_ge3,
           round(avg(run_len), 6) AS avg_run
    FROM runs
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Gaps-and-islands: per-user runs of consecutive same-type "
        "events via the two-row_number difference trick, reduced to "
        "per-type run statistics (streak detection / state-dwell "
        "analysis). Both row_numbers share the (user_id, ts, "
        "event_id) sort, so the rows shuffle and sort ONCE on user_id "
        "and the second window rides the same exchange; the run and "
        "type aggregations are plain hash aggs with map-side "
        "partials. The event_id tie-break makes island labels "
        "engine-exact at microsecond ties.",
    tags=("timeseries", "window", "islands", "events"),
)
def events_type_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return type_islands(
        ev.select("user_id", "event_type", "event_id", "ts_us"))


@register(
    "rolling_median_daily_revenue",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day,
           round(rev, 2) AS revenue,
           round(median(rev) OVER (ORDER BY day
                                   ROWS BETWEEN 6 PRECEDING
                                   AND CURRENT ROW), 2) AS med7
    FROM d
    ORDER BY day
    """,
    doc="7-row rolling MEDIAN of daily revenue — the robust "
        "smoother (one outlier day cannot move it, unlike the "
        "moving average), exact in both engines (even-count frames "
        "average the two middle values identically). Facts reduce "
        "to the calendar-bounded day table FIRST, so the unkeyed "
        "ordered window runs over ~hundreds of rows per decade "
        "regardless of fact volume — same bounded-domain argument "
        "as ewma_daily_revenue's band join; at 100 TB the day "
        "aggregation is the only fact-sized shuffle.",
    tags=("timeseries", "window", "robust", "median"),
)
def rolling_median_daily_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    # Spark refuses percentile-family aggregates over a window FRAME,
    # so the 7-row median is computed explicitly: gather the frame via
    # lags, drop the leading-edge NULLs, sort the <=7 values, average
    # the middle pair — identical semantics to DuckDB's windowed
    # median (quantile_cont 0.5), all JVM expression work.
    orders = load_table(spark, sf_dir, "orders")
    d = (orders.groupBy(F.to_date("o_orderdate").alias("day"))
         .agg(F.sum("o_totalprice").alias("rev")))
    w = Window.orderBy("day")
    frame = F.array_sort(F.filter(
        F.array(F.col("rev"),
                *[F.lag("rev", i).over(w) for i in range(1, 7)]),
        lambda x: x.isNotNull()))
    n = F.size(frame)
    med = (F.element_at(frame, ((n - 1) / 2).cast("int") + 1)
           + F.element_at(frame, (n / 2).cast("int") + 1)) / 2
    return (
        d.select("day", F.round("rev", 2).alias("revenue"),
                 F.round(med, 2).alias("med7"))
        .orderBy("day")
    )

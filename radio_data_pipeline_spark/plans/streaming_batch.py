"""Batch forms of the Structured Streaming queries (streaming/events.py).

Each function here calls the SAME transformation the streaming path
uses — the streaming module applies watermarks only on streaming
inputs — so the DuckDB oracle that validates the batch form validates
the streaming query logic too; tests/test_streaming.py then pins
streaming-vs-batch equality through the availableNow harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table
from radio_data_pipeline_spark.streaming.events import (
    session_event_counts,
    sliding_user_activity,
    tumbling_event_counts,
)

_GAP_US = 30 * 60 * 1_000_000


@register(
    "events_tumbling_counts",
    oracle="""
    SELECT
      CAST(epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
                                                        AS win_start_us,
      event_type,
      count(*)                                          AS n_events,
      round(sum(value), 2)                              AS total_value
    FROM events
    GROUP BY win_start_us, event_type
    ORDER BY win_start_us, event_type
    """,
    doc="Tumbling event-time window aggregation (streaming/events.py "
        "tumbling_event_counts, batch form). Streaming state is bounded "
        "by the watermark horizon; batch form is a plain grouped agg "
        "with map-side partial aggregation.",
    tags=("streaming", "window-agg"),
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.ordering import bounded_sort
    events = load_table(spark, sf_dir, "events")
    # output bounded by calendar buckets x event-type domain (hours in
    # the time horizon, not input rows) -> single-partition range
    # sort, no boundary-sampling job (operators/ordering.py).
    # Horizon bound (r11 ADVICE): buckets grow with the TIME SPAN, not
    # the corpus — a decade of hourly buckets x 5 types is ~440k
    # narrow rows through the one sort task (milliseconds); corpus
    # replication leaves the bucket count CONSTANT (measured at the
    # 100x corpus: same output rows as sf0.1 — BENCH_SCALING r12).
    # A deployment whose horizon outgrows that (century-scale spans
    # or second-granularity windows) should widen the window or
    # revert to the parallel orderBy.
    return bounded_sort(tumbling_event_counts(events, window="1 hour"),
                        "win_start_us", "event_type")


@register(
    "events_session_window_counts",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS tu,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessioned AS (
      SELECT user_id, tu,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY tu
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(min(tu) AS BIGINT) AS session_start_us,
           count(*)                AS n_events
    FROM sessioned
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
    doc="F.session_window gap sessions per user (streaming/events.py "
        "session_event_counts, batch form). Spark merges event "
        "intervals [ts, ts+gap); the oracle reconstructs the identical "
        "sessions with a lag + running-sum rewrite — a new session "
        "starts exactly when the gap to the previous event is >= gap.",
    tags=("streaming", "session-window"),
)
def events_session_window_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (session_event_counts(events, gap="30 minutes")
            .orderBy("user_id", "session_start_us"))


@register(
    "events_sliding_window_users",
    oracle="""
    WITH x AS (
      SELECT user_id,
             epoch_us(time_bucket(INTERVAL '1 hour', ts))
               - k.k * 3600000000 AS win_start_us
      FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT CAST(win_start_us AS BIGINT) AS win_start_us,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM x
    GROUP BY win_start_us
    ORDER BY win_start_us
    """,
    doc="Sliding event-time window (2h window, 1h slide) distinct-user "
        "activity (streaming/events.py sliding_user_activity, batch "
        "form) — the third streaming window family alongside tumbling "
        "and session. Spark replicates each event into window/slide "
        "buckets before aggregating; the oracle reproduces that "
        "assignment explicitly (each event joins to offsets [0,1] of "
        "its hour bucket). Streaming state is bounded by the "
        "watermark; the replication factor (=2) is the window/slide "
        "ratio, the knob a 100 TB deployment sizes deliberately.",
    tags=("streaming", "window-agg", "sliding"),
)
def events_sliding_window_users(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from radio_data_pipeline_spark.operators.ordering import bounded_sort
    events = load_table(spark, sf_dir, "events")
    # output bounded by calendar buckets (hourly slides x the 2-bucket
    # replication factor in the time horizon, not input rows) — the
    # events_tumbling_counts adjudication; see that call site for the
    # horizon-bound argument (r12)
    return (sliding_user_activity(events)
            .withColumn("n_users", F.col("n_users").cast("bigint"))
            .transform(bounded_sort, "win_start_us"))

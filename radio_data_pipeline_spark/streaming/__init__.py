"""Structured Streaming surface (SURVEY.md §2.8 — absent from the
reference, provided Spark-natively): watermarked event-time windows,
streaming dedup, and the calibration state machine as a stateful
streaming operator."""

from radio_data_pipeline_spark.streaming.events import (
    EVENTS_RAW_SCHEMA,
    dedup_events,
    read_events_stream,
    run_available_now,
    session_event_counts,
    sliding_user_activity,
    stream_to_training_shards,
    stream_with_constraint_gate,
    tumbling_event_counts,
    view_purchase_pairs,
)
from radio_data_pipeline_spark.streaming.segmentation import (
    CalScanState,
    find_calibrations_stream,
)

__all__ = [
    "EVENTS_RAW_SCHEMA",
    "CalScanState",
    "dedup_events",
    "find_calibrations_stream",
    "read_events_stream",
    "run_available_now",
    "session_event_counts",
    "sliding_user_activity",
    "stream_to_training_shards",
    "stream_with_constraint_gate",
    "tumbling_event_counts",
    "view_purchase_pairs",
]

"""Structured Streaming layer (SURVEY.md §2.B "Streaming" row).

The reference has no streaming engine — its "continuous" behaviors are
poll loops with ``time.sleep`` (icerunner.py:723-736 reader, :744-767
writer, :1140-1144 mirror). This package is the idiomatic-Spark upgrade
path the survey calls out: incremental micro-batch pipelines with event
-time watermarks, windowed/sessionized aggregation, streaming dedup, and
a custom stateful operator — the primitives a continuously-ingesting
100 TB training-data pipeline needs.
"""

from icerunner_spark.streaming.pipeline import (
    dedup_stream,
    high_water_marks,
    high_water_marks_stream,
    high_water_marks_stream_aip,
    read_events_stream,
    run_available_now,
    running_user_totals,
    session_counts,
    stream_state_partitions,
    view_purchase_attribution,
    windowed_counts,
)

__all__ = [
    "read_events_stream",
    "high_water_marks",
    "high_water_marks_stream",
    "high_water_marks_stream_aip",
    "windowed_counts",
    "session_counts",
    "dedup_stream",
    "running_user_totals",
    "run_available_now",
    "stream_state_partitions",
    "view_purchase_attribution",
]

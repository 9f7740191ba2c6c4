"""Streaming & live tables: event-time windowed aggregation (tumbling /
sliding / session, batch + Structured Streaming forms), watermarked late
data, and CDC-style auto-refreshing materialized analyses.

(reference surface: raise_/analytics/live_table.py + the WATERMARK
checkpoint hook, SURVEY §2.11 — the reference has no true stream operator
set; we implement its CDC-refresh contract on Structured Streaming and
legitimately exceed it with event-time windows, which its Aggregation
``window``/``rolling`` semantics already imply)
"""

from raise_featurestore_spark.streaming.windows import (
    SessionWindowSpec,
    SlidingWindowSpec,
    TumblingWindowSpec,
    compile_window_agg,
    window_agg_to_sql,
)
from raise_featurestore_spark.streaming.live_table import (
    LiveTable,
    RefreshEvent,
    RefreshPolicy,
)

__all__ = [
    "SessionWindowSpec",
    "SlidingWindowSpec",
    "TumblingWindowSpec",
    "compile_window_agg",
    "window_agg_to_sql",
    "LiveTable",
    "RefreshEvent",
    "RefreshPolicy",
]

"""Structured Streaming twins of the batch operators (SURVEY.md §2C:
the reference is batch-per-queue-message; these map the same semantics
onto unbounded inputs) plus the custom stateful operator."""

from dane_visual_feature_extraction_worker_spark.streaming.stateful import (
    running_totals,
)
from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    streaming_session_stats,
    streaming_tumbling_agg,
)

__all__ = ["streaming_session_stats", "streaming_tumbling_agg", "running_totals"]

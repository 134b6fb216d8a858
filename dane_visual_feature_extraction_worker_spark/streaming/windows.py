"""Streaming sessionization + tumbling aggregation.

Batch↔streaming mapping (SURVEY.md §2C):
- gap sessionization (operators/sessionize.py) ↔ ``F.session_window(ts,
  gap)`` with a watermark bounding state;
- tumbling aggregation (operators/windows.tumbling_agg) ↔ ``F.window``
  over a watermarked stream.

The queue-driven reference worker (worker.py:33-49: one RabbitMQ message
per entity, processed as a bounded job) corresponds to a stream of
transcript rows processed with ``trigger(availableNow=True)`` — the
tests run exactly that against the batch operators' results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_session_stats(
    stream: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-session rollup over an unbounded stream.

    The watermark lets Spark finalize (and drop state for) sessions
    older than it. Boundary semantics (ADVICE r1): the batch operator
    starts a new session when gap is STRICTLY > gap_seconds, while
    ``session_window`` ends a session at exactly prev_ts + gap (a row
    landing exactly gap later starts a new one). Using a session gap of
    gap_seconds + 1 microsecond makes the two agree at microsecond
    timestamp granularity: diff >= gap+1µs  ⟺  diff > gap.
    """
    gap = f"{int(gap_seconds * 1_000_000) + 1} microseconds"
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("win"), F.col(entity))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
        )
        .select(entity, "n_turns", "start_ts", "end_ts")
    )


def streaming_tumbling_agg(
    stream: DataFrame,
    duration: str = "1 day",
    ts: str = "ts",
    entity: str = "conv_id",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration).alias("win"), F.col(entity))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"), entity, "n"
        )
    )

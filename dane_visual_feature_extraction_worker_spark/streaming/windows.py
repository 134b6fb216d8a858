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


def session_sink_append(
    stream: DataFrame,
    flush: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    ts: str = "ts",
    watermark: str = "1 hour",
    timeout_s: float = 600.0,
) -> None:
    """APPEND-mode session rollup to a file sink — the production shape.

    Complete-mode + memory sink (streaming_session_stats harness)
    materializes every session on the DRIVER each trigger; at corpus
    scale the rollup must stream to a distributed sink in append mode,
    where a session row is emitted exactly once, when the watermark
    passes its close. The catch: append mode only emits sessions the
    watermark has CLOSED, and a bounded (availableNow) run ends with
    the watermark at max_event_time - delay — silently swallowing every
    session newer than that. The fix is the classic watermark flusher:
    union a tiny ``flush`` stream of sentinel rows timestamped far
    enough past the real data (> gap + delay beyond max real ts per
    entity) that (a) the final watermark passes every real session's
    close, and (b) the sentinel sessions themselves are never closed,
    so they never appear in the output. Result: byte-identical session
    set to the batch operator, no driver materialization anywhere.
    """
    gap = f"{int(gap_seconds * 1_000_000) + 1} microseconds"
    out = (
        stream.unionByName(flush)
        .withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("win"), F.col(entity))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
        )
        .select(entity, "n_turns", "start_ts", "end_ts")
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, timeout_s)


def _await_bounded(q, timeout_s: float) -> None:
    """awaitTermination(timeout) returns False on timeout with the query
    STILL RUNNING — returning silently would let callers read a partial
    sink as if it were the complete rollup (ADVICE r3). Stop the query
    and raise instead."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"bounded streaming query did not finish within {timeout_s}s; "
            "sink contents are partial"
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


def tumbling_sink_append(
    stream: DataFrame,
    flush: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    duration: str = "1 day",
    ts: str = "ts",
    entity: str = "conv_id",
    watermark: str = "1 hour",
    timeout_s: float = 600.0,
) -> None:
    """APPEND-mode tumbling rollup to a file sink (see
    :func:`session_sink_append` for the watermark-flush rationale —
    identical here, with window arithmetic instead of gaps): sentinel
    rows must land > one window + delay past the real max ts so the
    final watermark closes every real window; the sentinel's own window
    is never passed by the watermark and never emits."""
    out = (
        stream.unionByName(flush)
        .withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration).alias("win"), F.col(entity))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), entity, "n")
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, timeout_s)

"""Streaming exact deduplication: first occurrence per key, emitted
immediately, state bounded by the watermark.

Batch↔streaming mapping (SURVEY.md §2C): batch ``dedup_exact``
(operators/dedup.py) keeps one row per content hash with a full
shuffle; the streaming twin keeps a state-store entry per key and
emits a key's FIRST arrival. Unbounded state is the scale hazard —
``dropDuplicatesWithinWatermark`` evicts entries once the watermark
passes them, so state is bounded by (arrival-rate x watermark delay)
instead of corpus cardinality: the correct shape for an always-on
ingest pipeline where true duplicates arrive close together (retries,
double-publishes, crawler revisits), while historical dedup stays a
batch job.

The append-mode file sink needs no watermark-flush sentinel (unlike
the windowed rollups in streaming/windows.py): dedup emits on arrival,
not on state closure, so a bounded (availableNow) run flushes every
retained row without any sentinel plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    _await_bounded,
)


def streaming_dedup_first(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-per-key stream with watermark-bounded state.

    Only the key columns are projected out: "which keys exist" is
    deterministic under any arrival order, while non-key attributes of
    the surviving row are arrival-order-dependent — projecting them
    would make the operator nondeterministic under retries/reorders
    (and unverifiable against a batch oracle)."""
    return (
        stream.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def dedup_sink_append(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
    timeout_s: float = 600.0,
) -> None:
    """Run the streaming dedup to a distributed parquet sink in append
    mode (availableNow-bounded; raises on timeout rather than leaving a
    partial sink readable — streaming/windows._await_bounded)."""
    out = streaming_dedup_first(stream, keys, ts=ts, watermark=watermark)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, timeout_s)

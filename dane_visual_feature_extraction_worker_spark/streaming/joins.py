"""Stream-stream interval join: correlating two unbounded streams.

This is the last Structured Streaming join shape beside the
stream-static enrichment (enrich.py): BOTH sides are unbounded, so
Spark must buffer each side's rows in the state store until the other
side can no longer produce a match. That requires (a) watermarks on
both event-time columns and (b) a time-range join condition — together
they bound how long a buffered row can still match, so state is
evicted instead of growing forever. Without them Spark either rejects
the append-mode query or buffers unboundedly; with them the state per
side is O(rows within the interval + watermark delay), constant for a
steady-rate stream at ANY total stream length — the property that
makes this runnable against an unbounded 100 TB/day event feed.

The classic use: attribute purchases to the click that preceded them
within an attribution window ("purchase within 1 h of a click") with
BOTH feeds live — the streaming twin of the batch interval join
(operators/intervals.py; reference precedent: keyframe-in-shot
interval matching, data_handling.py:111-126).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    _await_bounded,
)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    interval_seconds: float,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Inner-join two watermarked streams on ``on`` with the time-range
    condition ``left_ts <= right_ts <= left_ts + interval_seconds``.

    Both inputs must be streaming DataFrames with event-time columns;
    watermarks are applied here (callers pass raw streams). The range
    condition is what lets Spark size the state store: a buffered left
    row is droppable once the right watermark passes
    ``left_ts + interval``, and vice versa.

    ``watermark_delay`` is the lateness budget — production sets it to
    the feed's real disorder bound; the bounded oracle harness sets it
    LARGE so the multi-micro-batch availableNow replay of unordered
    parquet files cannot drop legitimate matches as "late" (inner
    stream-stream joins silently drop late rows by design — determinism
    of the gate requires the conservative budget; the state-eviction
    semantics are identical, just with a longer horizon).

    ``how="leftOuter"`` adds unmatched-left emission: a buffered left
    row with no match is emitted null-extended only once the RIGHT
    watermark passes its join horizon (Spark can't know "no match" any
    earlier) — so outer rows trail live data by the watermark delay,
    and a bounded run only emits the outer rows whose horizon a later
    micro-batch's watermark crossed (tests/test_stream_join_wsample.py
    drives this with a multi-batch replay). The gate key stays inner:
    outer emission is watermark-timing-dependent, which a value-hash
    oracle can't replay deterministically.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts]
            # milliseconds so a sub-second window is not silently
            # truncated to INTERVAL 0 by int(seconds)
            + F.expr(
                f"INTERVAL {int(round(interval_seconds * 1000))} MILLISECONDS"
            )
        )
    )
    return lw.join(rw, cond, how).drop(rw[on])


def interval_join_sink_append(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    interval_seconds: float,
    sink_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "365 days",
    timeout_s: float = 600.0,
) -> None:
    """Run the stream-stream interval join to an append parquet sink,
    availableNow-bounded (the gate harness; production drops the
    trigger and tightens ``watermark_delay``)."""
    out = stream_interval_join(
        left, right, on, left_ts, right_ts, interval_seconds, watermark_delay
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

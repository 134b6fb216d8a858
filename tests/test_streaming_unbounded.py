"""Unbounded (rate-source) streaming: the query really runs continuously
under a processing-time trigger and is stopped by the caller — no
availableNow bound anywhere."""

import time

import pyspark.sql.functions as F

from dane_visual_feature_extraction_worker_spark.streaming.unbounded import (
    rate_transcript_stream,
    run_unbounded,
    windowed_turn_counts,
)


def _drain(q, seen, min_batches, timeout_s=45.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if q.exception() is not None:
            raise q.exception()
        if len([s for s in seen if s]) >= min_batches:
            return
        time.sleep(0.3)
    raise AssertionError(
        f"only {len([s for s in seen if s])} non-empty batches "
        f"after {timeout_s}s"
    )


def test_rate_stream_is_unbounded_and_schema_stable(spark):
    """Raw projection: multiple micro-batches arrive while the query is
    live; values partition into conv/turn coordinates exactly as the
    deterministic rate counter dictates."""
    stream = rate_transcript_stream(spark, rows_per_second=400, n_convs=8)
    batches = []
    q = run_unbounded(
        stream,
        lambda df, bid: batches.append(df.collect()),
        output_mode="append",
    )
    try:
        _drain(q, batches, min_batches=3)
        assert q.isActive  # still running: nothing bounded it
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = [r for b in batches for r in b]
    assert len(rows) > 0
    # the rate counter is dense from 0: conv/turn must invert to value
    values = sorted(r["conv_id"] + 8 * r["turn_idx"] for r in rows)
    assert values == list(range(values[0], values[0] + len(values)))
    assert all(0 <= r["conv_id"] < 8 for r in rows)


def test_windowed_counts_finalize_under_watermark(spark):
    """Watermarked tumbling agg over the unbounded stream: windows
    finalize (append mode) once the watermark passes them, and each
    finalized window's count equals what the rate counter put there."""
    stream = rate_transcript_stream(spark, rows_per_second=200, n_convs=4)
    agg = windowed_turn_counts(stream, window="1 seconds", watermark="1 seconds")
    batches = []
    q = run_unbounded(
        agg,
        lambda df, bid: batches.append(df.collect()),
        output_mode="append",
    )
    try:
        _drain(q, batches, min_batches=2, timeout_s=60.0)
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = [r for b in batches for r in b]
    assert rows, "no windows finalized"
    # append mode: every (window, conv) emitted at most once — final
    keys = [(r["win_start"], r["conv_id"]) for r in rows]
    assert len(keys) == len(set(keys))
    # full-second windows at 200 rows/s over 4 convs: interior windows
    # carry 50 turns per conv; edge windows may be partial
    assert all(0 < r["n_turns"] <= 50 for r in rows)
    assert any(r["n_turns"] == 50 for r in rows), rows

"""Truly unbounded streaming ingestion (A17's continuous shape).

Everything else in ``streaming/`` runs bounded (``availableNow`` over
parquet directories — the batch-with-resume shape the north rule asks
for, and the form the oracle gate can verify). This module closes the
remaining gap: a genuinely unbounded source driven by a processing-time
trigger, the shape a production deployment would run against a message
bus. The source is Spark's built-in ``rate`` format — monotonically
increasing ``(timestamp, value)`` rows generated executor-side — mapped
into the transcript schema, so every downstream operator (watermarked
tumbling aggregation here; sessionization, dedup, stateful totals by
composition) runs unchanged on bounded and unbounded inputs.

Swapping the source for Kafka is a one-line change
(``readStream.format("kafka")`` + the same projection); the rate source
keeps the demo dependency-free in this container.

Reference provenance: the reference worker consumes an unbounded
RabbitMQ queue one message at a time (worker.py:33-49); this is that
queue's semantics under Structured Streaming — unbounded input,
incremental state, results emitted per micro-batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def rate_transcript_stream(
    spark: SparkSession,
    rows_per_second: int = 500,
    n_convs: int = 20,
) -> DataFrame:
    """Unbounded transcript-shaped stream from the built-in rate source:
    row ``value`` k becomes turn ``k DIV n_convs`` of conversation
    ``k MOD n_convs`` at the source's event timestamp. Deterministic
    values, wall-clock timestamps — exactly what a bus-backed ingest
    looks like to the engine."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return src.select(
        F.pmod(F.col("value"), F.lit(n_convs)).alias("conv_id"),
        F.expr(f"value DIV {n_convs}").alias("turn_idx"),
        F.col("timestamp").alias("ts"),
    )


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "2 seconds",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Watermarked tumbling per-conversation turn counts over an
    unbounded stream — state is bounded by (n_convs x windows inside
    the watermark horizon), independent of stream length."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("max_turn"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "conv_id",
            "n_turns",
            "max_turn",
        )
    )


def run_unbounded(
    result: DataFrame,
    batch_fn,
    trigger: str = "500 milliseconds",
    output_mode: str = "update",
):
    """Start ``result`` under a processing-time trigger, delivering each
    micro-batch to ``batch_fn(df, batch_id)``. Returns the live query —
    the caller owns stop(). This is the production loop: unlike the
    ``availableNow`` harnesses, the query never self-terminates."""
    return (
        result.writeStream.outputMode(output_mode)
        .trigger(processingTime=trigger)
        .foreachBatch(batch_fn)
        .start()
    )

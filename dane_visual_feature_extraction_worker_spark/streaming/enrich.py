"""Stream-static enrichment: joining an unbounded stream against a
batch dimension table.

The remaining Structured Streaming join surface beside the windowed
aggs (windows.py), watermarked dedup (dedup.py), and custom state
(stateful.py): Spark plans a stream ⨝ static join stateless — every
micro-batch joins against the CURRENT static relation, no watermark,
no state store — so a broadcast dim enriches an arbitrarily long
stream at constant memory. This is the streaming twin of the batch
dim-enrichment pattern (plans/driver_queries.customer_enrich); the
dim re-resolves per micro-batch, so a dim backed by a live table
(Iceberg/Delta) picks up dimension updates between batches — the
classic slowly-changing-dimension serving shape.

Reference provenance: the reference resolves each queue message's
entity against its catalog before processing (worker.py:66-90); this
is that per-item lookup as a streaming broadcast join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    _await_bounded,
)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Inner-join an unbounded stream with a static dimension on
    ``on``. With ``broadcast_dim`` (the right call whenever the dim
    fits an executor) every micro-batch is a map-side hash join —
    zero shuffle of the stream, zero state."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on)


def enrich_sink_append(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    sink_dir: str,
    checkpoint_dir: str,
    timeout_s: float = 600.0,
) -> None:
    """Run the enrichment to an append parquet sink, availableNow-
    bounded (the oracle-gate harness shape; production drops the
    trigger and the same query runs forever)."""
    out = stream_static_enrich(stream, dim, on)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, timeout_s)

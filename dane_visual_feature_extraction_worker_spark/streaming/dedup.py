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


def near_dup_probe_sink(
    doc_stream: DataFrame,
    index_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    timeout_s: float = 600.0,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> None:
    """Streaming incremental near-dup ingest: per micro-batch, (1) the
    batch's MinHash bands probe the persisted band index for
    batch×corpus pairs plus the batch self-join, appending distinct
    ``(doc_a, doc_b)`` to the sink; (2) the batch's bands APPEND to
    the index, so later batches pair against this one — after the run,
    the sink holds exactly the pair set a full-corpus LSH run emits
    for pairs touching any streamed doc, regardless of how the stream
    was micro-batched (the gate proves it with maxFilesPerTrigger=1).

    foreachBatch because the probe is a self-join + distinct no
    append-mode operator expresses.  State lives in the index files,
    not the state store — the always-on shape for corpus-scale dedup
    where per-key state would be unbounded.  Micro-batches run
    serially, so the read-then-append on the index is race-free.
    Exactly-once caveat: plain parquet appends are at-least-once under
    batch RETRY (a crash between the two writes replays the batch);
    production sinks key both writes by batchId (overwrite-partition
    or MERGE) to make the retry idempotent."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        band_probe_pairs,
        minhash_bands,
        shingle_table,
    )

    def _probe_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        sh = shingle_table(batch, id_col, text_col, k)
        nb = minhash_bands(sh, n_hashes, band_size, id_col).persist()
        try:
            idx = spark.read.parquet(index_dir)
            band_probe_pairs(nb, idx, id_col).write.mode("append").parquet(
                sink_dir
            )
            nb.write.mode("append").parquet(index_dir)
        finally:
            nb.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(_probe_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_bounded(q, timeout_s)

"""Flagship pipeline: point-in-time features over transcript tables.

The end-to-end job the north rule names: for every (conv_id, ts) anchor,
an as-of matched state + a D=32 feature vector computed from history
only, sessionized, with the positional output layout mirroring the
reference's ``[timestamp, shot_start, shot_end, features...]`` matrix
(feature_extraction.py:26-31): here
``(conv_id, turn_idx, ts, session_id, session_start, session_end,
features)``.

Two physical strategies, identical output (bit-for-bit, asserted in
tests/test_kernel.py):

- ``windows`` (default, the scale path): pure-Catalyst window plan —
  read → JVM text features (narrow) → window prefix aggregates over
  (conv_id ORDER BY ts, turn_idx) → sink. ONE shuffle, zero Python:
  whole-stage codegen end to end, so throughput scales with cores
  (no Python-worker memory-bandwidth ceiling — BENCH/BASELINE.md).
- ``pandas``: bucket-grouped applyInPandas Arrow kernel (the
  reference-shaped vectorized batch kernel; also the fixture oracle).
  read → JVM text features → groupBy(bucket) applyInPandas → sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dane_visual_feature_extraction_worker_spark.kernel import (
    feature_vectors,
    feature_vectors_windows,
)


def pit_features(
    transcripts: DataFrame,
    n_buckets: int | None = None,
    strategy: str = "windows",
) -> DataFrame:
    """Features + per-session bounds for every (conv_id, ts) anchor.

    ``strategy``: 'windows' (pure-JVM Catalyst plan, default) or
    'pandas' (Arrow kernel; ``n_buckets`` sizes its pandas buckets —
    pick so one bucket ≈ corpus/n_buckets rows fits executor memory)."""
    if strategy == "windows":
        return feature_vectors_windows(transcripts)
    if strategy == "pandas":
        return feature_vectors(transcripts, n_buckets=n_buckets)
    raise ValueError(f"unknown strategy: {strategy!r}")


def pit_features_array(
    transcripts: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Array-form output (fixture schema); flat form is the scale sink."""
    from dane_visual_feature_extraction_worker_spark.kernel import with_feature_array

    return with_feature_array(pit_features(transcripts, n_buckets))


def write_features(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by_day: bool = True,
    ts_col: str = "ts",
) -> None:
    """Production feature sink: parquet partitioned by event date.

    Day partitions give readers partition pruning on the time axis (a
    backfill touching one week rewrites 7 partitions, not the table) —
    with ``spark.sql.sources.partitionOverwriteMode=dynamic`` an
    ``overwrite`` replaces only the partitions present in ``df``
    (idempotent re-runs of a date range, the batch analogue of the
    reference's per-job output replacement, io_util.py:182-203)."""
    import pyspark.sql.functions as F

    w = df
    if partition_by_day:
        w = df.withColumn("ds", F.to_date(F.col(ts_col)))
        (
            w.write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ds")
            .parquet(path)
        )
    else:
        w.write.mode(mode).parquet(path)

"""Flagship pipeline: point-in-time features over transcript tables.

The end-to-end job the north rule names: for every (conv_id, ts) anchor,
an as-of matched state + a D=32 feature vector computed from history
only, sessionized, with the positional output layout mirroring the
reference's ``[timestamp, shot_start, shot_end, features...]`` matrix
(feature_extraction.py:26-31): here
``(conv_id, turn_idx, ts, session_id, session_start, session_end,
features)``.

Plan shape (ONE shuffle total, on bucket(conv_id)):
  read → JVM text features (narrow) → groupBy(bucket) applyInPandas
  kernel (features + session ids + session bounds — the whole
  conversation is in kernel memory, so bounds cost no extra shuffle)
  → sink
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dane_visual_feature_extraction_worker_spark.kernel import feature_vectors


def pit_features(transcripts: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Features + per-session bounds for every (conv_id, ts) anchor.

    ``n_buckets`` sizes the kernel's pandas buckets — pick so one bucket
    (≈ corpus/n_buckets rows incl. text) fits executor memory."""
    return feature_vectors(transcripts, n_buckets=n_buckets)


def pit_features_array(
    transcripts: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Array-form output (fixture schema); flat form is the scale sink."""
    from dane_visual_feature_extraction_worker_spark.kernel import with_feature_array

    return with_feature_array(pit_features(transcripts, n_buckets))

"""Flagship pipeline: point-in-time features over transcript tables.

The end-to-end job the north rule names: for every (conv_id, ts) anchor,
an as-of matched state + a D=32 feature vector computed from history
only, sessionized, with the positional output layout mirroring the
reference's ``[timestamp, shot_start, shot_end, features...]`` matrix
(feature_extraction.py:26-31): here
``(conv_id, turn_idx, ts, session_id, session_start, session_end,
features)``.

Plan shape (one entity-key shuffle total):
  read → groupBy(conv_id) applyInPandas kernel (features + session ids)
       → broadcast-free session bounds via a second window over the
         SAME partitioning (Catalyst reuses the exchange)
       → write parquet partitioned by bucket(conv_id)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.kernel import feature_vectors


def pit_features(transcripts: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Features + per-session bounds for every (conv_id, ts) anchor.

    ``n_buckets`` sizes the kernel's pandas buckets — pick so one bucket
    (≈ corpus/n_buckets rows incl. text) fits executor memory; defaults
    to spark.sql.shuffle.partitions."""
    fv = feature_vectors(transcripts, n_buckets=n_buckets)
    w = Window.partitionBy("conv_id", "session_id")
    return fv.select(
        "conv_id",
        "turn_idx",
        "ts",
        "session_id",
        F.min("ts").over(w).alias("session_start"),
        F.max("ts").over(w).alias("session_end"),
        "features",
    )

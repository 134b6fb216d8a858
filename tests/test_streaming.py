"""Streaming twins produce the same session/tumbling rollups as batch
when run over the same bounded input with trigger(availableNow)."""

from __future__ import annotations

import pandas as pd

from dane_visual_feature_extraction_worker_spark.operators.sessionize import session_stats
from dane_visual_feature_extraction_worker_spark.streaming.windows import (
    streaming_session_stats,
)


def test_streaming_sessionize_matches_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "stream_src")
    transcripts.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(transcripts.schema).parquet(src)
    q = (
        streaming_session_stats(stream, gap_seconds=1800.0)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("sess_stream")
        .toPandas()
        .sort_values(["conv_id", "start_ts"])
        .reset_index(drop=True)
    )
    ref = (
        session_stats(transcripts, 1800.0, order=["ts", "turn_idx"])
        .toPandas()
        .sort_values(["conv_id", "start_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_turns", "start_ts", "end_ts"]],
        ref[["conv_id", "n_turns", "start_ts", "end_ts"]],
        check_dtype=False,
    )

from __future__ import annotations

import pytest

from dane_visual_feature_extraction_worker_spark.sources import (
    read_transcripts,
    write_table,
)


def test_read_transcripts_roundtrip(spark, transcripts, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_table(transcripts, p)
    back = read_transcripts(spark, p)
    assert back.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert back.count() == transcripts.count()


def test_read_transcripts_missing_column_fails(spark, transcripts, tmp_path):
    p = str(tmp_path / "bad.parquet")
    write_table(transcripts.drop("role"), p)
    with pytest.raises(ValueError, match="missing columns.*role"):
        read_transcripts(spark, p)

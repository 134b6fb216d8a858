"""Table/file sources and sinks (SURVEY.md A1/A2/A14-A16 analogues)."""

from dane_visual_feature_extraction_worker_spark.sources.catalog import (
    read_table,
    read_transcripts,
    write_table,
)

__all__ = ["read_table", "read_transcripts", "write_table"]

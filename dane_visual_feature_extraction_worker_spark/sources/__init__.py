"""Table/file sources and sinks (SURVEY.md A1/A2/A14-A16 analogues)."""

from dane_visual_feature_extraction_worker_spark.sources.archives import (
    archive_sink,
    build_tar_archives,
    read_tar_members,
    tar_members_to_mm,
)
from dane_visual_feature_extraction_worker_spark.sources.catalog import (
    read_table,
    read_transcripts,
    write_table,
)
from dane_visual_feature_extraction_worker_spark.sources.maintenance import (
    compact_parquet,
)

__all__ = [
    "archive_sink",
    "build_tar_archives",
    "compact_parquet",
    "read_table",
    "read_tar_members",
    "read_transcripts",
    "tar_members_to_mm",
    "write_table",
]

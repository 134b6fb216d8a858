"""Shared scalar helpers (engine function surface, SURVEY.md §2C)."""

from dane_visual_feature_extraction_worker_spark.functions.timeutil import (
    epoch_seconds,
    round_half_away,
    ts_seconds_pd,
)

__all__ = ["epoch_seconds", "round_half_away", "ts_seconds_pd"]

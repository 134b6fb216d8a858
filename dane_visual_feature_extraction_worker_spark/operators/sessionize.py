"""Gap-based sessionization.

Generalizes the reference's tumbling segmentation (misc/example.py:23-30
cuts audio into contiguous 1 s chunks) to data-driven boundaries: a new
session starts when the gap to the previous row in the same entity
exceeds ``gap_seconds``. session_id = running count of boundary flags —
two window passes over the same (entity, order) sort, so Catalyst plans
exactly one shuffle + one sort for both.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.functions import epoch_seconds


def sessionize(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    ts: str = "ts",
    order: Sequence[str] | None = None,
) -> DataFrame:
    """Add ``session_id`` (0-based per entity)."""
    order = list(order) if order else [ts]
    w = Window.partitionBy(entity).orderBy(*order)
    gap = epoch_seconds(ts) - F.lag(epoch_seconds(ts), 1).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    df = df.withColumn("__new", is_new)
    cum = Window.partitionBy(entity).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_id", (F.sum("__new").over(cum) - 1).cast("bigint")
    ).drop("__new")


def session_stats(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    ts: str = "ts",
    order: Sequence[str] | None = None,
) -> DataFrame:
    """Per-session rollup (conv_id, session_id, n_turns, start_ts, end_ts)."""
    s = sessionize(df, gap_seconds, entity, ts, order)
    return s.groupBy(entity, "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts).alias("start_ts"),
        F.max(ts).alias("end_ts"),
    )

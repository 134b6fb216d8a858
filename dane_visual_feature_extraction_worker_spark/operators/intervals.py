"""Interval containment join with first-hit dedup and sentinel fill.

Direct generalization of the reference's shot lookup:
- containment test ``start <= ts <= end`` vectorized with numpy
  (reference: data_handling.py:121-126 ``find_shot_for_timestamp``,
  ``np.logical_and(arr[:,0] <= ts, arr[:,1] >= ts)``),
- overlapping intervals → FIRST hit wins (data_handling.py:124-126
  ``hits[0]`` in table order = earliest start),
- no containing interval → sentinel ``(-1, -1)``
  (data_handling.py:127-129).

Physical plan: the interval table is small relative to the probe side
(like the reference's fully-in-memory shot list), so we broadcast it —
Catalyst turns the containment predicate into a broadcast nested-loop
join, which is exactly the reference's strategy distributed over probe
partitions. The ``row_number`` dedup window runs per probe row key.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.functions import epoch_seconds

SENTINEL = -1


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    entity: str = "conv_id",
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    probe_keys: Sequence[str] | None = None,
    broadcast_intervals: bool = True,
    sentinel_seconds: float = float(SENTINEL),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """probes ⟕ first containing interval; sentinel timestamps on miss.

    Output adds ``shot_start``/``shot_end`` (epoch seconds, double;
    ``-1.0`` sentinel mirroring the reference) and the interval's other
    columns (null on miss).
    """
    pk = list(probe_keys) if probe_keys else [entity, ts]
    iv = intervals.select(
        F.col(entity).alias("__i_key"),
        F.col(start).alias("__i_start"),
        F.col(end).alias("__i_end"),
        *[c for c in intervals.columns if c not in (entity, start, end)],
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = (
        (probes[entity] == iv["__i_key"])
        & (iv["__i_start"] <= probes[ts])
        & (probes[ts] <= iv["__i_end"])
    )
    j = probes.join(iv, cond, "left").drop("__i_key")
    w = Window.partitionBy(*[F.col(c) for c in pk]).orderBy(
        F.col("__i_start").asc_nulls_last(),
        F.col("__i_end").asc_nulls_last(),
        *[F.col(c).asc_nulls_last() for c in tiebreak],
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(
            "shot_start",
            F.coalesce(epoch_seconds(F.col("__i_start")), F.lit(sentinel_seconds)),
        )
        .withColumn(
            "shot_end",
            F.coalesce(epoch_seconds(F.col("__i_end")), F.lit(sentinel_seconds)),
        )
        .drop("__i_start", "__i_end")
    )

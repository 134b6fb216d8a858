"""Joins: modality outer-merge with zero-fill, salted skew-safe join.

- ``outer_merge``: the reference merges keyframe and spectrogram maps on
  the timestamp key by updating one dict from two globs — a full outer
  join — and substitutes a zero tensor for an absent modality at read
  time (reference: data_handling.py:31-51 build; :93-99,106-109
  zero-fill). Spark version: ``full_outer`` join + ``coalesce`` with the
  zero value.

- ``salted_join``: the reference sidesteps skew structurally (one entity
  per queue job, worker.py:66-90). At 10^12 turns a hot conv_id melts a
  single shuffle partition, so the engine salts hot keys: fact side gets
  ``salt = pmod(xxhash64(...), n_salts)`` (hash util precedent
  base_util.py:205-206), the dim side is exploded across all salts, the
  join runs on (key, salt), results are identical to the unsalted join.
  AQE's skew-join split covers sort-merge joins automatically; explicit
  salting is for the cases AQE can't touch (grouped applyInPandas, or
  when the dim side must stay broadcast).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def outer_merge(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    fills: dict | None = None,
) -> DataFrame:
    """Full-outer join of two per-key feature tables with zero-fill.

    ``fills``: column -> fill literal (e.g. 0.0); applied to both sides'
    non-key columns where the other side had no row.
    """
    out = a.join(b, list(keys), "full_outer")
    for c, v in (fills or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side, explode the dim side.

    Result columns == plain ``fact.join(dim, key, how)``.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    ts_col: str | None = None,
) -> DataFrame:
    """Key-distribution diagnostic — the measurement that drives the
    salting decisions (`auto_salt_prefix_features` routes entities past
    a count threshold into the block-decomposed kernel; this report is
    how a job picks that threshold and whether to salt at all).

    Emits ONE row: key count, row count, max/mean key size, exact
    p50/p99 of key sizes, and `skew_factor` = max_rows / mean_rows
    (the straggler multiplier a single-task-per-key stage pays).
    Plan: one map-side-combined count per key, then a single-row
    rollup of the |keys|-sized frame — the corpus is read once,
    column-pruned to the key."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_rows"),
        (
            F.floor(
                F.sum("__n").cast("double")
                / F.count(F.lit(1))
                * 1e6
            )
            / 1e6
        ).alias("mean_rows"),
        F.percentile(F.col("__n"), F.lit(0.5)).alias("p50_rows"),
        F.percentile(F.col("__n"), F.lit(0.99)).alias("p99_rows"),
        (
            F.floor(
                F.max("__n").cast("double")
                / (F.sum("__n").cast("double") / F.count(F.lit(1)))
                * 1e6
            )
            / 1e6
        ).alias("skew_factor"),
    )

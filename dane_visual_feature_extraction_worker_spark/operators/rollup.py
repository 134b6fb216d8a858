"""Incremental aggregate maintenance: merge pre-aggregated rollups
with raw deltas instead of rescanning the corpus.

At 100 TB the daily question is never "aggregate everything again" —
it's "yesterday's rollup + today's partition".  Algebraic aggregates
(count, sum, min, max — and anything decomposable into them, e.g.
mean = sum/count) merge from PARTIAL states exactly: the combined
rollup is bit-identical to a from-scratch aggregation, which is
precisely what makes the operator gateable against a plain GROUP BY
oracle.  Holistic aggregates (exact median, distinct count) do NOT
merge this way — that is what the sketch surface (sketches.py HLL/GK)
exists for; this module refuses them by contract rather than
approximating silently.

The reference worker recomputes per-file from scratch on every run
(reference worker.py:60-74 download-then-process loop, no state); the
checkpoint surface (checkpoint.py) resumes WORK, this merges RESULTS.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# the partial-state schema every rollup here carries
STATE_COLS = ("n_rows", "sum_value", "min_value", "max_value")


def rollup_state(
    df: DataFrame, key: str, value: str = "value"
) -> DataFrame:
    """Build the algebraic partial state per ``key``: count / exact
    decimal(18,2) sum / min / max of ``value`` — one map-side-combined
    aggregation.  The sum stays DECIMAL inside the state (merging
    double partials would re-order float addition; decimal merge is
    associative-exact, the _dsum discipline)."""
    v = F.col(value).cast("decimal(18,2)")
    return df.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(v).cast("decimal(38,2)").alias("sum_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )


def merge_rollups(base: DataFrame, *others: DataFrame) -> DataFrame:
    """Merge rollup states (all built by ``rollup_state`` on the same
    key) into one — count adds, sum adds in decimal, min/max fold.
    Keys present in only one input pass through (full outer merge by
    re-aggregation, not a join: N states union into ONE exchange).

    Result is bit-identical to ``rollup_state`` over the concatenated
    raw inputs: count/sum are associative in int64/decimal, min/max
    idempotent-associative.  That identity is the gate.
    """
    key_cols = [c for c in base.columns if c not in STATE_COLS]
    u = base
    for o in others:
        u = u.unionByName(o)
    return u.groupBy(*key_cols).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("sum_value").cast("decimal(38,2)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )

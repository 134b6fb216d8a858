"""Sketch-based approximate aggregation — the 100 TB profiling path.

Exact per-entity ``count_distinct`` keeps a set per group (a second
exchange level and O(|values|) state: user_event_profile documents the
exact plan); exact percentiles keep a value→count map
(quantile_bucketize documents the domain bound). Neither is the plan
you run FIRST over 10^12 rows. These operators are the sketch twins:
HyperLogLog++ distinct counts and t-digest-style quantiles — fixed
O(kB) state per group, single-pass, mergeable (map-side combined), the
standard first-look profile over a corpus too large to count exactly.

Results are approximate by construction, so these keys carry NO SQL
oracle (DuckDB's sketches use different internals); the correctness
contract is the tolerance test in tests/test_sketches.py — each
estimate within the sketch's published error bound of the exact
answer computed on the same (small) input — plus the rows-only gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def approx_profile(
    df: DataFrame,
    entity: str = "user_id",
    distinct_col: str = "event_type",
    value: str = "value",
    rsd: float = 0.02,
    pctl_accuracy: int = 1000,
) -> DataFrame:
    """Per-entity sketch profile: HLL++ approximate distinct count of
    ``distinct_col`` (relative standard deviation ``rsd``) and
    approximate p50/p95 of ``value`` (Greenwald-Khanna with
    1/``pctl_accuracy`` rank error), plus the exact row count that
    comes free with the same pass.

    ONE map-side-combined aggregate: sketch state is a few KB per
    (task, entity) regardless of corpus size — the shuffle carries
    merged sketches, never values. This is the plan that profiles
    10^12 rows in one pass; the exact twins (user_event_profile,
    grouped_quantiles) are for when the answer must be exact and the
    domain is known to be bounded.
    """
    return df.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("n_distinct_est"),
        F.percentile_approx(value, 0.5, pctl_accuracy).alias("p50_est"),
        F.percentile_approx(value, 0.95, pctl_accuracy).alias("p95_est"),
    )

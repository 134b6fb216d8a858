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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    entity: str = "user_id",
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    cell_seconds: float = 3600.0,
) -> DataFrame:
    """Interval-INTERVAL overlap join: all (left, right) pairs of the
    same entity whose closed time ranges intersect
    (``l_start <= r_end AND r_start <= l_end``) — the generalization of
    ``interval_join``'s point-in-interval probe (reference precedent:
    keyframe-in-shot, data_handling.py:121-126; two RANGES overlapping
    is the shot-vs-ad-break / session-vs-incident case neither side of
    that lookup covers).

    Scale plan — equi-join on GRID CELLS, never a theta join: each
    interval explodes to the ``cell_seconds`` grid cells it touches
    (floor(start/L)..floor(end/L)); candidates join on
    ``(entity, cell)`` — pure equi keys, hash-partitionable, AQE-skew-
    splittable; a pair spanning k shared cells appears k times, so a
    ``distinct`` on the pair key dedups before the exact overlap
    predicate filters false cell-neighbors. A naive theta join is a
    per-entity CROSS product (dead at 10^12 rows); the grid costs
    (len/L + 1) candidate rows per interval — pick L near the median
    interval length so the explode factor stays ~2 and a cell holds few
    intervals. All boundary math in integer microseconds.

    Inputs carry an ``l_id`` / ``r_id`` column each; output is one row
    per overlapping pair with both ranges and the overlap length in
    microseconds (closed intervals: touching endpoints overlap with
    length 0).
    """
    cell_us = int(cell_seconds * 1_000_000)

    def cells(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        # integer DIV, not floor(a/b): a 53-bit double quotient can
        # round up across a cell boundary
        lo = F.expr(
            f"unix_micros(CAST(`{s}` AS TIMESTAMP)) DIV {cell_us}"
        )
        hi = F.expr(
            f"unix_micros(CAST(`{e}` AS TIMESTAMP)) DIV {cell_us}"
        )
        return df.select(
            "*", F.explode(F.sequence(lo, hi)).alias(f"__cell_{tag}")
        )
    lc = cells(left, l_start, l_end, "l")
    rc = cells(right, r_start, r_end, "r")
    cand = lc.join(
        rc,
        (lc[entity] == rc[entity]) & (lc["__cell_l"] == rc["__cell_r"]),
    ).drop(rc[entity])
    pairs = cand.drop("__cell_l", "__cell_r").distinct()
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    overlap = (us(l_start) <= us(r_end)) & (us(r_start) <= us(l_end))
    ov_len = F.least(us(l_end), us(r_end)) - F.greatest(
        us(l_start), us(r_start)
    )
    return pairs.where(overlap).select(
        entity,
        "l_id",
        "r_id",
        l_start,
        l_end,
        r_start,
        r_end,
        ov_len.alias("overlap_us"),
    )


def coverage_stats(
    intervals: DataFrame,
    entity: str = "user_id",
    start: str = "start_s",
    end: str = "end_s",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity merged-interval union coverage (gaps-and-islands).

    Generalizes the reference's shot-boundary table from *lookup*
    (interval_join above) to *profiling*: given possibly-overlapping
    ``[start, end)`` integer-second intervals per entity, report how
    much of the timeline the union actually covers, how many disjoint
    islands it merges into, and the enclosing span — the coverage
    audit run before trusting interval-table features
    (reference interval semantics: data_handling.py:114-129).

    Algorithm is the classic sorted sweep: with intervals ordered by
    ``(start, tiebreak)``, the union contribution of each interval is
    ``greatest(0, end - greatest(start, M))`` where ``M`` is the
    running max of ``end`` over all STRICTLY PRECEDING intervals, and
    a new island begins exactly where ``start > M``. All arithmetic
    is int64 seconds — exact on any engine.

    Plan: ONE hash exchange on ``entity`` feeds both the running-max
    window and the final per-entity rollup (same partitioning key, so
    Catalyst reuses the exchange); no self-join, no explode — O(n)
    per entity regardless of overlap depth.
    """
    order = [F.col(start)] + ([F.col(tiebreak)] if tiebreak else []) + [
        F.col(end)
    ]
    w = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.col(end)).over(w)
    contrib = F.greatest(
        F.lit(0).cast("bigint"),
        F.col(end) - F.greatest(F.col(start), F.coalesce(prev_max, F.col(start))),
    )
    island = F.when(
        prev_max.isNull() | (F.col(start) > prev_max), 1
    ).otherwise(0)
    swept = intervals.select(
        entity,
        F.col(start).alias("__s"),
        F.col(end).alias("__e"),
        contrib.alias("__cov"),
        island.alias("__isl"),
    )
    return swept.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("__cov").cast("bigint").alias("covered_seconds"),
        F.sum("__isl").cast("bigint").alias("n_islands"),
        (F.max("__e") - F.min("__s")).cast("bigint").alias("span_seconds"),
    )


def peak_concurrency(
    intervals: DataFrame,
    entity: str = "entity",
    start: str = "start_ts",
    end: str = "end_ts",
    pad_seconds: int = 0,
) -> DataFrame:
    """EXACT peak concurrency over intervals — how many are open at
    the busiest instant, and when it first happens. THE capacity
    number: peak simultaneous conversations sizes serving fleets, and
    with ``pad_seconds`` = watermark delay it upper-bounds a
    streaming job's LIVE STATE KEYS (an interval's state lives until
    its end + the watermark). ``coverage_stats`` measures the union
    LENGTH; this measures the DEPTH.

    Plan (the sweep-line, distributed): intervals → ±1 deltas
    (+1 at start, −1 at end+pad, ends EXCLUSIVE via +1µs so
    back-to-back intervals don't double-count), then a running sum
    over the global (ts, delta desc, entity) order WITHOUT a
    single-partition window: repartitionByRange + sortWithinPartitions
    (one range exchange of the 2·|intervals| delta frame — entity-
    sized, never the corpus), per-partition running sums via a
    spark_partition_id window (one pid exchange of the same small
    frame), per-partition totals prefix-summed on the DRIVER
    (|partitions| rows), broadcast offsets added back. The delta
    frame is persisted between the two jobs (the global_index
    contract: monotonic ids must not be recomputed).

    Output: ONE row ``(n_intervals, peak, peak_ts)`` — peak_ts the
    FIRST instant reaching the peak.
    """
    if pad_seconds < 0:
        raise ValueError("pad_seconds must be >= 0")
    s_us = F.unix_micros(F.col(start).cast("timestamp"))
    e_us = (
        F.unix_micros(F.col(end).cast("timestamp"))
        + F.lit(int(pad_seconds) * 1_000_000 + 1)
    )
    base = intervals.select(
        F.col(entity).alias("__e"), s_us.alias("__s"), e_us.alias("__x")
    )
    deltas = base.select(
        F.col("__s").alias("__ts"), F.lit(1).alias("__d"), "__e"
    ).unionByName(
        base.select(
            F.col("__x").alias("__ts"), F.lit(-1).alias("__d"), "__e"
        )
    )
    n_parts = int(
        intervals.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"
        )
    )
    ranged = (
        deltas.repartitionByRange(
            n_parts, F.col("__ts"), F.col("__d").desc(), F.col("__e")
        )
        .sortWithinPartitions(
            F.col("__ts"), F.col("__d").desc(), F.col("__e")
        )
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged.persist()
    try:
        totals = (
            ranged.groupBy("__pid")
            .agg(F.sum("__d").cast("bigint").alias("__t"))
            .collect()
        )
        offs, acc = [], 0
        for r in sorted(totals, key=lambda r: r["__pid"]):
            offs.append((r["__pid"], acc))
            acc += r["__t"]
        omap = intervals.sparkSession.createDataFrame(
            offs, "__pid int, __off long"
        )
        w = (
            Window.partitionBy("__pid")
            .orderBy(F.col("__ts"), F.col("__d").desc(), F.col("__e"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        running = (
            ranged.withColumn("__local", F.sum("__d").over(w))
            .join(F.broadcast(omap), "__pid")
            .select(
                "__ts",
                (F.col("__off") + F.col("__local"))
                .cast("bigint")
                .alias("__depth"),
            )
        )
        out = running.agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
            F.max("__depth").alias("peak"),
            F.min_by("__ts", F.struct(-F.col("__depth"), F.col("__ts")))
            .alias("__pts"),
        ).select(
            "n_intervals",
            "peak",
            F.timestamp_micros(F.col("__pts")).alias("peak_ts"),
        )
        rows = out.collect()
    finally:
        ranged.unpersist()
    return intervals.sparkSession.createDataFrame(
        rows, "n_intervals bigint, peak bigint, peak_ts timestamp"
    )

"""Per-entity ordered-content digests — the text-equality certificate.

The north rule requires "per-turn text equality under stable
(conv_id, turn_idx) ordering" (BASELINE.json input_hint; the reference
asserts its analogue by slicing the output matrix positionally against
golden rows, tests/unit/feature_extraction_test.py:56-60). An
order-SENSITIVE digest per conversation certifies both halves at once:
two engines produce the same digest iff every turn's payload matches
at the same position in the stable ordering. One digest row per entity
makes the certificate O(|entities|) to store/compare — the practical
way to diff two 100 TB corpus copies.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: ASCII unit separator — cannot appear in the digested payload
#: rendering, so concatenation is injective.
_SEP = "\x1f"


def ordered_digest(
    df: DataFrame,
    entity: str = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
    payload: Column | None = None,
) -> DataFrame:
    """md5 over the entity's payloads in stable ``order`` + turn count.

    Plan: ONE map-side-combinable aggregation (collect_list runs in
    ObjectHashAggregate with partial merge) — the shuffle carries
    per-partition partial lists, and ``sort_array`` over the
    (order..., payload) struct re-establishes the stable global order
    AFTER the merge, so the digest is independent of partition layout
    and merge order. No window, no global sort. Memory note for
    100 TB: the aggregation buffers one entity's history per group —
    conversations are bounded (10^3-10^5 turns), which is exactly the
    reference's own per-file working set (it loads one entity's
    keyframe list in memory, data_handling.py:30-33); for unbounded
    entities digest in time-blocks and chain the block digests.
    """
    if payload is None:
        payload = F.concat_ws(
            "|", F.col("event_id").cast("string"), F.col("event_type")
        )
    ordered = F.sort_array(
        F.collect_list(F.struct(*[F.col(c) for c in order], payload.alias("__p")))
    )
    return (
        df.groupBy(entity)
        .agg(ordered.alias("__xs"))
        .select(
            entity,
            F.size("__xs").alias("n_turns"),
            F.md5(
                F.concat_ws(_SEP, F.transform("__xs", lambda x: x["__p"]))
            ).alias("digest"),
        )
    )


def pit_leak_audit(
    df: DataFrame,
    entity: str = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
    value: str = "value",
    anchor_mod: int = 16,
    anchor_key: str = "event_id",
) -> DataFrame:
    """Temporal-leakage audit: recompute each anchor's cumulative
    point-in-time aggregates by TWO independent plans and certify they
    agree — the runnable form of the north rule's "no feature reads
    turns with ts greater than the anchor".

    Path A is the engine's own shape (running count + exact cents sum
    over ``ROWS UNBOUNDED PRECEDING .. CURRENT ROW``). Path B is the
    definitional one: join every audited anchor to the entity's rows
    and aggregate those with (order) <= anchor's (order) — the frame
    is re-derived from the raw predicate, so a window that silently
    read the future would disagree with it. The report is per entity:
    anchors audited, count/sum mismatches (0 on a leak-free engine),
    and an order-insensitive checksum of path-A values so the gate
    hashes real data, not just zeros.

    Scale: path B is quadratic per entity by definition, so anchors
    are deterministically sampled (``anchor_key % anchor_mod == 0``) —
    the audit costs |rows| x |anchors|/entity via one broadcast-able
    join per entity partition; at 10^12 turns run it on a sampled
    entity slice the same way. Rows with NULL order keys are excluded
    (their frame membership is engine-NULL-ordering-dependent).
    """
    if anchor_key != order[-1]:
        raise ValueError("anchor_key must be the last order column")
    oc = [F.col(c) for c in order]
    notnull = df.where(F.col(entity).isNotNull())
    for c in order:
        notnull = notnull.where(F.col(c).isNotNull())
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    w = (
        Window.partitionBy(entity)
        .orderBy(*oc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Path A: the engine's windowed shape
    a = notnull.select(
        F.col(entity).alias("__e"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order)],
        F.count(F.lit(1)).over(w).alias("__cnt_w"),
        F.sum(cents).over(w).alias("__sum_w"),
    ).where((F.col(f"__o{len(order) - 1}").isNotNull()))
    anchors = a.where(F.col(f"__o{len(order) - 1}") % anchor_mod == 0)
    # Path B: definitional re-derivation via join + predicate
    rows = notnull.select(
        F.col(entity).alias("__e2"),
        *[F.col(c).alias(f"__r{i}") for i, c in enumerate(order)],
        cents.alias("__cents"),
    )
    cond = F.col("__e2") == F.col("__e")
    # lexicographic (order) <= anchor
    lex = F.lit(False)
    for i in range(len(order) - 1, -1, -1):
        lt = F.col(f"__r{i}") < F.col(f"__o{i}")
        eq = F.col(f"__r{i}") == F.col(f"__o{i}")
        lex = lt | (eq & lex) if i < len(order) - 1 else lt
    eq_all = F.lit(True)
    for i in range(len(order)):
        eq_all = eq_all & (F.col(f"__r{i}") == F.col(f"__o{i}"))
    joined = anchors.join(rows, cond & (lex | eq_all), "inner")
    b = joined.groupBy(
        "__e", *[f"__o{i}" for i in range(len(order))], "__cnt_w", "__sum_w"
    ).agg(
        F.count(F.lit(1)).alias("__cnt_j"),
        F.sum("__cents").alias("__sum_j"),
    )
    return (
        b.groupBy(F.col("__e").alias(entity))
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.sum(
                (F.col("__cnt_j") != F.col("__cnt_w")).cast("bigint")
            ).alias("n_count_leaks"),
            F.sum(
                (F.col("__sum_j") != F.col("__sum_w")).cast("bigint")
            ).alias("n_sum_leaks"),
            F.sum("__cnt_w").alias("sum_counts"),
            F.sum("__sum_w").alias("sum_cents"),
        )
    )


def disorder_audit(
    events: DataFrame,
    entity: str = "conv_id",
    ts: str = "ts",
    seq: str = "turn_idx",
) -> DataFrame:
    """Out-of-order-arrival audit per entity — the WATERMARK PLANNING
    table for the streaming shelf: an event is LATE when its event
    time is behind the running maximum seen so far in arrival
    (``seq``) order, and ``max_disorder_us`` (the worst event-time
    regression) is exactly the watermark delay a streaming job must
    allow to avoid dropping it. Run this over a batch sample before
    choosing ``withWatermark``.

    Plan: ONE entity exchange; the running max is a window over the
    same sort the exchange already provides; the rollup rides the
    shuffle's map side. All timestamps exact integer microseconds.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = (
        Window.partitionBy("entity")
        .orderBy("__seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = events.select(
        F.col(entity).alias("entity"),
        us.alias("__us"),
        F.col(seq).alias("__seq"),
    ).withColumn("__prevmax", F.max("__us").over(w))
    late = F.col("__prevmax") > F.col("__us")
    return (
        flagged.groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(late.cast("bigint")).cast("bigint").alias("n_late"),
            F.max(
                F.when(late, F.col("__prevmax") - F.col("__us"))
            ).alias("max_disorder_us"),
        )
        .select(
            "entity",
            "n_events",
            F.coalesce(F.col("n_late"), F.lit(0))
            .cast("bigint")
            .alias("n_late"),
            F.expr("coalesce(n_late, 0) * 1000000 DIV n_events")
            .cast("bigint")
            .alias("late_micro"),
            F.col("max_disorder_us").cast("bigint"),
        )
    )


def order_inversions(
    events: DataFrame,
    entity: str = "conv_id",
    ts: str = "ts",
    seq: str = "turn_idx",
) -> DataFrame:
    """Total disorder between the ``seq`` order and event time per
    entity: the exact INVERSION COUNT (pairs i<j with ts_i > ts_j) —
    a Kendall-tau-style integrity number. ``disorder_audit`` sees
    only ADJACENT regressions (the streaming view); interleaved
    sessions or merged logs show up here as a quadratic inversion
    mass while barely moving the adjacent rate.

    Plan: ONE entity exchange (collect_list + post-merge sort_array
    by seq — partition-layout independent), inversions counted
    ARRAY-SIDE in O(n²) per entity (bounded conversations; swap to a
    merge-sort pandas kernel past ~10⁴ turns — documented, same
    contract), |entities|-row output. Share is over n·(n−1)/2 pairs.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    per = events.groupBy(F.col(entity).alias("entity")).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(seq).alias("__s"), us.alias("__t"))
                )
            ),
            lambda x: x["__t"],
        ).alias("__ts")
    )
    arr = F.col("__ts")
    n = F.size(arr)
    inv = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.size(
            F.filter(
                F.slice(arr, i + 1, n - i),
                lambda x: x < F.element_at(arr, i),
            )
        ).cast("bigint"),
    )
    out = per.select(
        "entity",
        n.cast("bigint").alias("n_events"),
        F.when(n >= 2, inv).otherwise(F.lit(0)).cast("bigint").alias(
            "inversions"
        ),
    )
    return out.select(
        "entity",
        "n_events",
        "inversions",
        F.when(
            F.col("n_events") >= 2,
            F.expr(
                "inversions * 1000000"
                " DIV (n_events * (n_events - 1) DIV 2)"
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("inversion_micro"),
    )


def watermark_sweep(
    events: DataFrame,
    delays_seconds: tuple[int, ...],
    entity: str = "conv_id",
    ts: str = "ts",
    seq: str = "turn_idx",
) -> DataFrame:
    """Watermark-delay pricing: for each candidate delay D, how many
    events a streaming job with ``withWatermark(D)`` would DROP (late
    by more than D behind the per-entity running event-time max) —
    the companion to ``disorder_audit``: that reports the worst
    regression (the zero-loss bound), this prices the cheaper
    candidates a production job actually considers (a 10-minute
    watermark that drops 0.01% may beat the zero-loss 6-hour one).

    Plan: the SAME one-entity-exchange running-max window as
    disorder_audit, then a |delays|-element explode over the flagged
    frame and a |delays|-row rollup. Exact integer microseconds.
    """
    if not delays_seconds or any(d < 0 for d in delays_seconds):
        raise ValueError("delays_seconds must be non-negative, non-empty")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = (
        Window.partitionBy("entity")
        .orderBy("__seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        events.select(
            F.col(entity).alias("entity"),
            us.alias("__us"),
            F.col(seq).alias("__seq"),
        )
        .withColumn("__prevmax", F.max("__us").over(w))
        .select(
            F.coalesce(
                F.col("__prevmax") - F.col("__us"), F.lit(0)
            ).alias("__lag_us")
        )
    )
    fanned = flagged.select(
        "__lag_us",
        F.explode(
            F.array(
                *[F.lit(int(d)) for d in sorted(delays_seconds)]
            )
        ).alias("delay_s"),
    )
    agg = fanned.groupBy("delay_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            (
                F.col("__lag_us")
                > F.col("delay_s").cast("bigint") * F.lit(1_000_000)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("n_dropped"),
    )
    return agg.select(
        F.col("delay_s").cast("bigint").alias("delay_s"),
        "n_events",
        "n_dropped",
        F.expr("n_dropped * 1000000 DIV n_events")
        .cast("bigint")
        .alias("drop_micro"),
    )

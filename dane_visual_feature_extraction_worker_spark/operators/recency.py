"""Per-type recency features — "how long since the last X" at each anchor.

The reference worker's feature rows are keyed by timestamp and its
provenance records carry the source event's own clock
(data_handling.py:33, worker.py provenance block); a production
point-in-time pipeline widens that into per-TYPE recency: at every
anchor turn, the time since the entity's most recent *user* turn, most
recent *tool* call, most recent *error*, … Staleness gates ("don't
trust a feature older than X") and response-latency metrics
(user→assistant turnaround) are both this one shape.

Exactness contract: all gaps are integer epoch MICROSECONDS (int64) —
no float timestamps anywhere — so a SQL twin replays bit for bit.

Plan shape: ONE exchange + ONE sort per call. Each per-type recency is
a conditional running MAX over the entity's ordered stream
(``max(CASE WHEN type=t THEN ts_us END)`` with a
``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING`` frame), so K types cost K
window expressions over the SAME window spec — Spark evaluates them in
one Window physical operator on one partitioning. No joins, no
per-type passes. At 10^12 turns this is the same single-exchange class
as lag/lead.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _us(ts: str) -> F.Column:
    return F.unix_micros(F.col(ts).cast("timestamp"))


def last_seen_gaps(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    order: Sequence[str] = ("ts", "event_id"),
    type_col: str = "event_type",
    types: Sequence[str] = ("click", "view", "purchase"),
) -> DataFrame:
    """At each anchor row: micros since the entity's most recent
    STRICTLY PRECEDING row of each type in ``types`` (NULL before the
    first sighting — cold start is "never seen", not zero).

    The strictly-preceding frame (``1 PRECEDING``) is the leakage
    guard: an anchor of type t does not see itself, so
    ``since_<t>_us`` is always computed from the PAST even for t's own
    rows. Rows with NULL timestamps are excluded up front (their frame
    position differs between engines' NULL orderings and a NULL anchor
    has no meaningful recency).
    """
    w = (
        Window.partitionBy(entity)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    anchor_us = _us(ts)
    cols = [F.col(c) for c in order] + [F.col(entity)]
    for t in types:
        last_t = F.max(
            F.when(F.col(type_col) == t, _us(ts))
        ).over(w)
        safe = "".join(ch if ch.isalnum() else "_" for ch in t)
        cols.append((anchor_us - last_t).alias(f"since_{safe}_us"))
    return df.where(F.col(ts).isNotNull()).select(*cols)


def response_latency(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    order: Sequence[str] = ("ts", "event_id"),
    type_col: str = "event_type",
    trigger: str = "view",
    response: str = "click",
) -> DataFrame:
    """Trigger→response turnaround: for each ``response``-type row, the
    integer micros since the entity's most recent strictly-preceding
    ``trigger``-type row (NULL when no trigger has occurred yet) — the
    user→assistant latency feature on transcript schemas.

    Same one-exchange conditional-window plan as
    :func:`last_seen_gaps`; the response filter is applied AFTER the
    window (the frame must see all rows) but prunes the output to the
    response rows only.
    """
    w = (
        Window.partitionBy(entity)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_trigger = F.max(
        F.when(F.col(type_col) == trigger, _us(ts))
    ).over(w)
    return (
        df.where(F.col(ts).isNotNull())
        .select(
            *[F.col(c) for c in order],
            F.col(entity),
            F.col(type_col),
            (_us(ts) - last_trigger).alias("latency_us"),
        )
        .where(F.col(type_col) == response)
        .drop(type_col)
    )


def activity_streaks(
    events: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-entity consecutive-day activity streaks (longest + the
    streak touching the last active day) — the engagement features
    retention modeling runs on; ``retention_cohorts`` sees cohort
    survival, ``recency`` features see the last gap, streaks see
    SUSTAINED habit. Classic gaps-and-islands, made exact: island key
    = epoch_day − dense_rank over the entity's distinct active days
    (consecutive days share it).

    Plan: distinct (entity, day) reduction (map-side combined — the
    corpus collapses to entity×days before any window), ONE
    entity-partitioned window over that frame, island rollup, entity
    rollup. All integer day arithmetic.
    """
    day = F.datediff(
        F.to_date(F.col(ts).cast("timestamp")), F.lit("1970-01-01")
    ).cast("bigint")
    days = (
        events.select(F.col(entity).alias("entity"), day.alias("__d"))
        .distinct()
    )
    w = Window.partitionBy("entity").orderBy("__d")
    isl = days.withColumn(
        "__k", F.col("__d") - F.row_number().over(w)
    )
    islands = isl.groupBy("entity", "__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__len"),
        F.max("__d").alias("__end"),
    )
    return islands.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("__len").cast("bigint").alias("n_active_days"),
        F.max("__len").cast("bigint").alias("longest_streak"),
        # __end is unique per entity (one island ends per day), so the
        # arg-max is deterministic on both engines
        F.max_by("__len", F.col("__end"))
        .cast("bigint")
        .alias("latest_streak"),
    )


def time_to_k(
    events: DataFrame,
    k: int = 5,
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Activation speed: microseconds from an entity's FIRST event to
    its K-th — the onboarding/retention feature ("time to 5th
    session") behind activation dashboards; NULL when the entity
    never reached k events (surfaced via ``reached_k``, not dropped —
    the not-yet-activated population is the point).

    Plan: ONE entity exchange (collect_list + post-merge sort_array,
    layout-independent), the k-th element read array-side — no
    row_number window, no second pass. Exact integer microseconds.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    per = events.groupBy(F.col(entity).alias("entity")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(us.alias("__t"), F.col(tiebreak).alias("__i"))
            )
        ).alias("__xs")
    )
    n = F.size("__xs")
    first = F.element_at("__xs", 1)["__t"]
    kth = F.when(n >= k, F.element_at("__xs", k)["__t"])
    return per.select(
        "entity",
        n.cast("bigint").alias("n_events"),
        (n >= k).alias("reached_k"),
        (kth - first).cast("bigint").alias("us_to_k"),
    )


def activity_bitmap(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    epoch_day0: int = 19723,
    horizon_days: int = 31,
) -> DataFrame:
    """Per-entity day-activity BITMAP features: pack a
    ``horizon_days``-day window into one int64 (bit k = active on
    day0+k), then read active-day count, longest consecutive streak
    and run count as PURE BIT ARITHMETIC — the zero-window twin of
    ``activity_streaks``: that operator sorts each entity's rows
    through a window exchange; this one needs ONE map-side-combined
    ``bit_or`` groupBy and a narrow select, because popcount, the
    trailing-ones identity (ones(x) = popcount(x ⊕ (x+1)) − 1, so
    longest run = max over shifts s of ones(mask >> s) — a LINEAR
    62-term greatest(), each term reading mask once; the naive smear
    chain mₖ = mₖ₋₁ & (mₖ₋₁<<1) doubles its expression tree per
    level and blows Catalyst up) and runs = popcount(m) −
    popcount(m & (m<<1)) are row-local integer ops.  The classic
    roaring-bitmap trick at the 64-bit scale a monthly window needs.

    Output: ``(entity, day_mask, active_days, longest_streak,
    n_runs)``.  Events outside [day0, day0 + horizon) are ignored
    (documented; widen the horizon or shard by month for longer
    spans — at 64+ days pack multiple masks).  ``horizon_days`` ≤ 62
    keeps every smear shift inside int64.
    """
    if not 1 <= horizon_days <= 62:
        raise ValueError("horizon_days must be in [1, 62]")
    off = F.expr(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV 86400000000"
        f" - {epoch_day0}"
    )
    bits = df.select(
        F.col(entity_col).alias("entity"), off.alias("__o")
    ).where(
        (F.col("__o") >= 0) & (F.col("__o") < horizon_days)
    ).select(
        "entity", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__o AS INT))").alias("__b")
    )
    masks = bits.groupBy("entity").agg(
        F.expr("bit_or(__b)").cast("bigint").alias("day_mask")
    )
    terms = [
        f"(bit_count(shiftright(day_mask, {s})"
        f" ^ (shiftright(day_mask, {s}) + 1)) - 1)"
        for s in range(horizon_days)
    ]
    longest = f"greatest({', '.join(terms)})" if len(terms) > 1 else terms[0]
    return masks.select(
        "entity",
        "day_mask",
        F.expr("bit_count(day_mask)").cast("bigint").alias("active_days"),
        F.expr(longest).cast("bigint").alias("longest_streak"),
        F.expr(
            "bit_count(day_mask) - bit_count(day_mask &"
            " shiftleft(day_mask, 1))"
        )
        .cast("bigint")
        .alias("n_runs"),
    )

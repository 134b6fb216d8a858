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


def session_features(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    ts: str = "ts",
    order: Sequence[str] | None = None,
) -> DataFrame:
    """Per-row session descriptors WITHOUT a join: session_id (gap
    rule), position within the session (PIT-safe: counts only rows
    at-or-before the anchor), and session-level size/duration
    (observation-time analytics — they read the whole session
    including rows after the anchor, so they are session DESCRIPTORS,
    not training features; same flag discipline as asof_join_nearest).

    Plan: sessionize's per-entity window + a second window keyed on
    (entity, session_id) with an unbounded frame. HashPartitioning on
    ``entity`` SATISFIES the (entity, session_id) clustering (subset
    rule), so the second window adds a sort but NO second exchange —
    the whole operator is one shuffle end to end (plan-audit-tested).
    """
    order = list(order) if order else [ts]
    s = sessionize(df, gap_seconds, entity, ts, order)
    w_pos = Window.partitionBy(entity, "session_id").orderBy(*order)
    w_all = (
        Window.partitionBy(entity, "session_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    dur = epoch_seconds(F.max(ts).over(w_all)) - epoch_seconds(
        F.min(ts).over(w_all)
    )
    return s.select(
        entity,
        *order,
        "session_id",
        F.row_number().over(w_pos).cast("bigint").alias("pos_in_session"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("session_n_turns"),
        (F.floor(dur * F.lit(1_000_000.0)) / F.lit(1_000_000.0)).alias(
            "session_duration_s"
        ),
    )


def session_cooccurrence(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "conv_id",
    category: str = "role",
    ts: str = "ts",
    order: Sequence[str] | None = None,
    min_sessions: int = 1,
) -> DataFrame:
    """Within-session co-occurrence counts: for every unordered pair of
    DISTINCT ``category`` values, in how many sessions do both appear —
    the association structure behind "tools used together", market-
    basket features, and co-usage embeddings (PMI over these counts is
    pmi_topk's job; this operator produces the exact pair table).

    Plan: sessionize (one per-entity window) → per-session sorted
    DISTINCT category set (collect_set is bounded by the category
    domain, not session length) → explode the i<j pairs of the sorted
    array via a nested `transform`/`flatten` (pure codegen — the
    self-join formulation shuffles the session table twice; this
    shuffles it never) → one map-side-combined count per pair. The
    session rollup rides the sessionize exchange (subset rule:
    hash(entity) satisfies (entity, session_id) clustering); the pair
    count is the only other exchange and its key domain is
    |categories|² — broadcast-scale at any corpus size.
    """
    s = sessionize(df, gap_seconds, entity, ts, order)
    sets = s.groupBy(entity, "session_id").agg(
        F.array_sort(F.collect_set(F.col(category))).alias("__cats")
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(__cats, (a, i) -> "
                    "transform(slice(__cats, i + 2, size(__cats)), "
                    "b -> struct(a AS cat_a, b AS cat_b)))"
                )
            )
        ).alias("__p")
    )
    return (
        pairs.select("__p.cat_a", "__p.cat_b")
        .groupBy("cat_a", "cat_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .where(F.col("n_sessions") >= min_sessions)
    )


def session_paths(
    df: DataFrame,
    gap_seconds: float = 3600.0,
    entity: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    order: Sequence[str] | None = None,
    path_len: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k ordered event PATHS: the most common length-``path_len``
    event-type sequences occurring INSIDE a session — the behavioral
    n-gram feature ("view>view>purchase") that funnel_conversion's
    fixed pattern and session_cooccurrence's unordered pairs both
    cannot express. Session boundaries cut paths: a sequence spanning
    two sessions is two user visits, not one behavior.

    Plan: sessionize's per-entity exchange; the ``path_len - 1`` leads
    ride the SAME sorted run ((entity, session_id) ordering is
    satisfied by the entity hash clustering — subset rule, no second
    exchange); rows whose window crosses the session end drop (lead's
    session_id differs); then ONE map-side-combined count on the path
    string (|distinct paths| <= |types|^path_len partials per
    partition) and a TakeOrderedAndProject for the top k — no global
    sort. Ties break on the path string, so top-k is deterministic.
    """
    order = list(order) if order else [ts]
    s = sessionize(df, gap_seconds, entity, ts, order)
    w = Window.partitionBy(entity, "session_id").orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, path_len)
    ]
    # the path stays in-session iff the LAST step is (session_id is
    # constant within the window partition, so any lead that exists is
    # in-session; null means the session ended first)
    path = F.concat_ws(">", *steps)
    got_all = steps[-1].isNotNull()
    return (
        s.withColumn("path", F.when(got_all, path))
        .where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("path"))
        .limit(k)
    )


def session_gap_sweep(
    df: DataFrame,
    gaps_seconds: list[int],
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session-gap PRICING: how many sessions (and what mean session
    span) each candidate inactivity threshold produces — the decision
    table behind ``sessionize_gaps``' fixed 30-minute constant, the
    sessionize twin of ``watermark_sweep``: pick the knee where the
    session count stops falling instead of cargo-culting 30 min.

    For threshold g: a session STARTS at every first event and every
    event whose gap from the previous exceeds g, so n_sessions =
    n_entities + Σ[gap > g] — one number per threshold from the SAME
    single lag pass, no re-sessionization per candidate.  Mean span =
    (total span − Σ gaps that split) / n_sessions, again exact from
    the one pass: every split removes exactly its gap from covered
    time.  All integer µs; one µs-precision DIV per threshold.

    Plan: ONE entity exchange (the lag window), a narrow
    |thresholds| explode, ONE |thresholds|-key rollup.  The corpus
    shuffles once regardless of candidate count.
    """
    if not gaps_seconds or any(g <= 0 for g in gaps_seconds):
        raise ValueError("gaps_seconds must be non-empty positive")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(entity_col).orderBy(us)
    lagged = df.select(
        F.col(entity_col).alias("__e"),
        us.alias("__us"),
        (us - F.lag(us).over(w)).alias("__gap"),
    )
    cand = F.array(*[F.lit(int(g) * 1_000_000) for g in gaps_seconds])
    exploded = lagged.select(
        "__e",
        "__us",
        "__gap",
        F.explode(cand).alias("gap_us"),
    )
    per = exploded.groupBy("gap_us").agg(
        F.countDistinct("__e").cast("bigint").alias("__ne"),
        F.sum(F.when(F.col("__gap") > F.col("gap_us"), 1).otherwise(0))
        .cast("bigint")
        .alias("__splits"),
        F.sum(
            F.when(F.col("__gap") > F.col("gap_us"), F.col("__gap")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("__cut_us"),
        F.sum(F.coalesce("__gap", F.lit(0))).cast("bigint").alias("__tot_gap"),
    )
    return per.select(
        (F.col("gap_us") / 1_000_000).cast("bigint").alias("gap_seconds"),
        (F.col("__ne") + F.col("__splits")).alias("n_sessions"),
        F.col("__splits").alias("n_splits"),
        F.expr("(__tot_gap - __cut_us) DIV (__ne + __splits)")
        .cast("bigint")
        .alias("mean_session_span_us"),
    )

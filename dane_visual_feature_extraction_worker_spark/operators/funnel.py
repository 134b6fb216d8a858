"""Ordered event-sequence analytics: funnels and retention cohorts.

The reference's per-entity ordered traversal (sorted timestamp key list,
data_handling.py:33, consumed in order by the batch loop,
feature_extraction.py:70-81) generalizes to the two classic
event-sequence questions a transcript/behavior corpus gets asked at
scale: "how far through an ordered step sequence did each entity get"
(funnel) and "how does activity persist relative to each entity's first
appearance" (retention). Both are single-digit-shuffle Catalyst plans —
no self-joins-per-step, no Python.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    entity: str = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: per entity, the timestamp of the first
    occurrence of step k that falls STRICTLY after the resolved time of
    step k-1 (first view, then first click after that view, then first
    purchase after that click, ...). Returns one row per entity with
    ``t_<step>`` columns (NULL once the chain breaks) plus ``reached``,
    the number of completed steps.

    Plan — ONE window pass, no per-step self-joins: over the ts-sorted
    per-entity run, ``r_k = min(CASE step_k AND ts > r_{k-1})`` as a
    running (unbounded-preceding..current) frame. A running min is
    equivalent to the global min here: any step-k candidate ordered
    AFTER the current row has ts >= current ts, so it can never satisfy
    the strict ``ts > r_k`` test the current row performs. The final
    per-entity reduction is a groupBy on the same key the window
    shuffled on — Catalyst reuses the exchange, so the whole funnel is
    one shuffle + one sort regardless of step count. O(steps) state per
    row; step count is a query constant, never data-sized.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    w = (
        Window.partitionBy(entity)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    prev_run = None
    run_cols = []
    for i, step in enumerate(steps):
        if prev_run is None:
            cand = F.when(F.col(type_col) == step, F.col(ts_col))
        else:
            cand = F.when(
                (F.col(type_col) == step) & (F.col(ts_col) > F.col(prev_run)),
                F.col(ts_col),
            )
        cand_name = f"__cand_{i}"
        run_name = f"__run_{i}"
        out = out.withColumn(cand_name, cand).withColumn(
            run_name, F.min(cand_name).over(w)
        )
        prev_run = run_name
        run_cols.append((step, cand_name))
    agg = out.groupBy(entity).agg(
        *[F.min(c).alias(f"t_{s}") for s, c in run_cols]
    )
    reached = F.lit(0)
    for s, _ in run_cols:
        reached = reached + F.col(f"t_{s}").isNotNull().cast("int")
    # chain-break monotonicity holds by construction (cand_k needs r_{k-1})
    return agg.select(
        entity,
        *[f"t_{s}" for s, _ in run_cols],
        reached.cast("int").alias("reached"),
    )


def retention_matrix(
    df: DataFrame,
    entity: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Cohort retention: entities grouped by the bucket of their FIRST
    event (the cohort), counted distinctly at each bucket offset since
    that first event — the "day-N retention" matrix.

    Plan: one map-side-combined ``min`` per entity (tiny result: one
    row per entity) joined back on the entity key — the join reuses
    the aggregation's hash partitioning, so no extra exchange on the
    big side — then one groupBy (cohort, offset) with an exact
    count_distinct. At 100 TB the first agg output is |entities| rows
    (always << events); the final matrix is |cohorts| x |offsets|,
    report-sized. All Catalyst; day arithmetic in integer days.
    """
    firsts = df.groupBy(entity).agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("__cohort")
    )
    joined = df.join(firsts, on=entity)
    return (
        joined.groupBy(
            F.col("__cohort").alias("cohort"),
            F.datediff(F.date_trunc(bucket, F.col(ts_col)), F.col("__cohort"))
            .cast("int")
            .alias("offset_days"),
        )
        .agg(F.countDistinct(entity).alias("n_entities"))
        .select("cohort", "offset_days", "n_entities")
    )


def lifetime_features(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-entity lifetime feature block: first/last seen, tenure days,
    distinct active days, event count — the RFM block's temporal
    sibling (recency measures distance from a cutoff; tenure/activity
    measure the span and density of the whole history).

    Exactness: timestamps reduce to integer epoch-micros min/max;
    tenure_days and active-day ids are integer `div`s of positive
    epochs. Plan: ONE exchange on entity — min/max/count and the
    distinct-day count share the same aggregation (Spark plans the
    single distinct column with a partial expand on the same key, no
    second corpus shuffle).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    day = F.expr(
        f"cast(unix_micros(cast({ts} as timestamp)) div 86400000000 "
        "as bigint)"
    )
    per = df.groupBy(entity).agg(
        F.min(us).cast("bigint").alias("first_us"),
        F.max(us).cast("bigint").alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct(day).cast("bigint").alias("active_days"),
    )
    return per.select(
        entity,
        "first_us",
        "last_us",
        F.expr("(last_us - first_us) div 86400000000")
        .cast("bigint")
        .alias("tenure_days"),
        "active_days",
        "n_events",
    )


def linear_attribution(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    touch_type: str = "click",
    conv_type: str = "purchase",
    type_col: str = "event_type",
    value_col: str = "value",
    campaign: F.Column | None = None,
    lookback_seconds: int = 7 * 86400,
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution — the fairness
    counterpart to last-touch: each conversion's value splits EQUALLY
    across every touch in its trailing ``lookback_seconds`` window,
    so upper-funnel touches stop reading as worthless.  Conversions
    with NO in-window touch report under campaign NULL at full value
    (unattributed — surfaced, never dropped; the last-touch entry's
    contract).

    The plan is the algebraic inversion that avoids the touch×conv
    range JOIN entirely: (1) per conversion, touches(p) = count of
    touches in (p − L, p) via one trailing RANGE frame, giving the
    per-conversion share s(p) = value·10⁶ DIV touches in exact
    micro-cents; (2) per touch, credit = Σ s(p) over conversions in
    (t, t + L] via one FORWARD range frame.  Two windows over the SAME
    (entity, ts) exchange — one shuffle total, zero joins, exact
    integers end to end (each conversion leaks < touches µ¢ to
    flooring; deterministic in any engine since shares are
    nonnegative).  Boundary rule: a touch at the conversion's exact
    microsecond is in NEITHER frame (strictly-before counts the touch,
    strictly-after credits it) — documented, symmetric.

    Output per campaign: ``(campaign, n_touches, credit_microcents)``
    plus the NULL row carrying unattributed conversions' full value.
    """
    if campaign is None:
        campaign = F.lit(None).cast("bigint")
    # exact integer microseconds (unix_micros / epoch_us) — a
    # double-seconds roundtrip (*1e6, truncate) can flip the last
    # digit between engines near representability boundaries
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lb = int(lookback_seconds) * 1_000_000
    is_touch = F.col(type_col) == touch_type
    is_conv = F.col(type_col) == conv_type
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    base = df.where(is_touch | is_conv).select(
        F.col(entity_col).alias("__e"),
        micros.alias("__us"),
        (F.col(type_col) == touch_type).alias("__t"),
        F.when(is_conv, cents).alias("__cents"),
        F.when(is_touch, campaign).alias("campaign"),
    )
    order = Window.partitionBy("__e").orderBy("__us")
    back = order.rangeBetween(-lb, -1)
    fwd = order.rangeBetween(1, lb)
    touches = F.sum(F.when(F.col("__t"), 1).otherwise(0)).over(back)
    with_share = base.withColumn(
        # empty trailing frame -> Spark sum() is NULL, not 0: coalesce,
        # or no-touch conversions vanish instead of landing in the
        # unattributed bucket
        "__nt",
        F.when(F.col("__cents").isNotNull(), F.coalesce(touches, F.lit(0))),
    ).withColumn(
        "__share",
        F.when(
            F.col("__nt") > 0,
            F.expr(
                "CAST(__cents AS DECIMAL(38,0)) * 1000000 DIV __nt"
            ),
        ).cast("bigint"),
    )
    credited = with_share.withColumn(
        "__credit", F.sum("__share").over(fwd)
    )
    # one row stream, one final rollup: touches carry their forward
    # credit; orphan conversions (no in-window touch) carry full value
    # under campaign NULL with zero touch count
    rows = credited.select(
        F.when(F.col("__t"), F.col("campaign")).alias("campaign"),
        F.when(F.col("__t"), 1).otherwise(0).alias("__is_touch"),
        F.when(F.col("__t"), F.coalesce("__credit", F.lit(0)))
        .when(F.col("__nt") == 0, F.expr("CAST(__cents AS BIGINT) * 1000000"))
        .alias("__amt"),
    ).where(F.col("__amt").isNotNull())
    return rows.groupBy("campaign").agg(
        F.sum("__is_touch").cast("bigint").alias("n_touches"),
        F.sum("__amt").cast("bigint").alias("credit_microcents"),
    )


def audience_overlap(
    df: DataFrame,
    entity_col: str = "user_id",
    category_col: str = "event_type",
) -> DataFrame:
    """Pairwise audience overlap between categories: for every
    category pair (a < b), the exact count of entities active in BOTH
    plus the Jaccard — "do clickers and purchasers overlap, or are
    they disjoint populations?", the |C|² matrix every campaign /
    channel review asks for.  Complements ``kmv_overlap`` (two sets,
    sketched) with the exact all-pairs small-|C| case.

    Plan: ONE distinct pass collapses the corpus to (entity,
    category) memberships (the only corpus-width exchange); per-
    category sizes ride a |C|-row aggregate; the pair counts come
    from the membership self-join ON THE ENTITY KEY — fan-out
    ≤ |C|² per entity (|C| = categories, single digits), never
    corpus × corpus.  Output ≤ |C|² rows: ``(cat_a, cat_b, n_a, n_b,
    n_both, jaccard_micro)``.
    """
    m = df.select(
        F.col(entity_col).alias("__e"), F.col(category_col).alias("__c")
    ).distinct()
    sizes = m.groupBy("__c").agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    both = (
        m.alias("a")
        .join(m.alias("b"), "__e")
        .where(F.col("a.__c") < F.col("b.__c"))
        .groupBy(
            F.col("a.__c").alias("cat_a"), F.col("b.__c").alias("cat_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        both.join(
            sizes.select(F.col("__c").alias("cat_a"), F.col("__n").alias("n_a")),
            "cat_a",
        )
        .join(
            sizes.select(F.col("__c").alias("cat_b"), F.col("__n").alias("n_b")),
            "cat_b",
        )
        .select(
            "cat_a",
            "cat_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("n_both * 1000000 DIV (n_a + n_b - n_both)")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )

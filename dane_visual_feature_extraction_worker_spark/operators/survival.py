"""Kaplan-Meier survival estimation over entity lifetimes.

The retention question every transcript/engagement corpus eventually
asks: "what fraction of users are still active after t hours of
observed lifetime?" — with the honest treatment of users who are STILL
active at the corpus cutoff (right-censoring) that a naive
fraction-retained query gets wrong.

The reference worker has no survival machinery (it processes one file
at a time); this is part of the feature/eval surface a production
pipeline adds around it, in the same family as rfm_features and
retention_cohorts.

Exactness contract (repo-wide): every count is an exact BIGINT; the
log-survival accumulates floor(ln(ratio-of-exact-ints) * 1e6)
micro-nats (the psi_drift / lm_perplexity discipline), so the running
product Π(1 - d/n) is replayed as an integer running SUM that any
engine reproduces bit-for-bit; floats appear only in the final exp /
1e-6-floor at the gate edge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

MICROS_PER_HOUR = 3_600_000_000


def km_survival(
    events: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    horizon_hours: int = 48,
) -> DataFrame:
    """Kaplan-Meier estimator over entity lifetimes →
    ``(duration_hours, n_at_risk, n_events, n_censored,
    log_survival_micronats, survival)``.

    Lifetime = hours between an entity's first and last event
    (floor-truncated). An entity whose last event is more than
    ``horizon_hours`` before the corpus cutoff (max ts — a lazy
    broadcast scalar, the rfm_features pattern) has OBSERVED
    churn (event = 1); an entity still active inside the horizon is
    right-CENSORED at its current lifetime (event = 0) — it leaves the
    risk set without contributing a death, the distinction that makes
    KM honest where a plain retained-fraction overstates churn.

    S(t) = Π_{t_i ≤ t, d_i > 0} (1 - d_i / n_i): accumulated as a
    running integer sum of micro-nat log terms; if the risk set is
    ever wholly consumed by deaths (n = d), survival is exactly 0 from
    that step on (ln undefined — flagged, not computed).

    Plan: the per-entity (first, last) rollup is the ONE corpus
    exchange (map-side combined). Everything downstream is
    lifetime-table-sized: a groupBy on duration (≤ corpus-span hours
    rows — domain-bounded like auc_exact's score histogram) and an
    unpartitioned window over that tiny frame. At 10^12 rows the
    shuffle carries |entities| pairs of int64s, nothing else.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    spans = events.where(F.col(ts).isNotNull()).groupBy(entity).agg(
        F.min(us).alias("__first"), F.max(us).alias("__last")
    )
    cut = spans.agg(F.max("__last").alias("__cut"))
    per = spans.crossJoin(F.broadcast(cut)).select(
        F.floor((F.col("__last") - F.col("__first")) / F.lit(MICROS_PER_HOUR))
        .cast("bigint")
        .alias("duration_hours"),
        F.when(
            F.col("__cut") - F.col("__last")
            > F.lit(horizon_hours * MICROS_PER_HOUR),
            1,
        )
        .otherwise(0)
        .alias("__observed"),
    )
    steps = per.groupBy("duration_hours").agg(
        F.sum("__observed").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("__observed")).cast("bigint").alias("n_censored"),
    )
    w_all = Window.orderBy("duration_hours").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("duration_hours").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.orderBy("duration_hours").rowsBetween(
        Window.unboundedPreceding, 0
    )
    left = F.col("n_events") + F.col("n_censored")
    at_risk = (
        F.sum(left).over(w_all) - F.coalesce(F.sum(left).over(w_prev), F.lit(0))
    ).cast("bigint")
    r = steps.select(
        "duration_hours", "n_events", "n_censored", at_risk.alias("n_at_risk")
    )
    # micro-nat log term: 0 when no deaths at this step; the n == d
    # step extinguishes the curve (flag, never ln(0))
    # (n == d can only occur on the LAST step — the risk set is empty
    # afterwards, so no later rows exist — but guard the ratio anyway)
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_at_risk") > F.col("n_events")),
        F.floor(
            F.log(
                (F.col("n_at_risk") - F.col("n_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * 1e6
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    dead = F.when(
        (F.col("n_events") > 0) & (F.col("n_at_risk") == F.col("n_events")), 1
    ).otherwise(0)
    r = r.select(
        "duration_hours",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.max(dead).over(w_run).alias("__dead"),
        F.sum(F.when(dead == 1, F.lit(0).cast("bigint")).otherwise(term))
        .over(w_run)
        .alias("__logsum"),
    )
    return r.select(
        "duration_hours",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.when(F.col("__dead") == 0, F.col("__logsum")).alias(
            "log_survival_micronats"
        ),
        F.when(F.col("__dead") == 1, F.lit(0.0))
        .otherwise(
            F.floor(F.exp(F.col("__logsum").cast("double") / 1e6) * 1e6) / 1e6
        )
        .alias("survival"),
    )

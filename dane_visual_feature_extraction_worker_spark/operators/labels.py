"""Training-label construction: strict-future outcome windows.

Features must only read the PAST of their anchor (the engine's
zero-temporal-leakage invariant, kernel.py); *labels* are the one
column that must read the FUTURE — "did the target event happen within
H seconds after this row?" is the supervised signal a point-in-time
feature table trains against. Keeping label construction inside the
same engine matters because the anchor/label boundary is where leakage
bugs live: this operator touches only rows STRICTLY after the anchor in
the stable (ts, id) order, so an anchor that is itself a target event
never labels itself positive.

Reference provenance: the reference worker emits per-keyframe feature
records consumed by a downstream trainer (worker.py:102-121 provenance
records); label construction is the corpus-scale counterpart the
trainer needs next to them.

Scale: the naive plan — `min(target_ts) OVER (ROWS BETWEEN 1 FOLLOWING
AND UNBOUNDED FOLLOWING)` — is the O(n²)-per-partition frame class
measured in BENCH/BASELINE.md (every row re-scans its whole following
frame). The plan here REVERSES the per-entity order and takes a running
`last(ignorenulls)` over the growing prefix, which Spark evaluates
incrementally in O(n): one shuffle on the entity key (the same exchange
every other per-entity window rides), one sort, zero joins.

All comparisons are exact integer microseconds (unix_micros); no float
time arithmetic anywhere, so a SQL oracle reproduces the result bit for
bit.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def future_window_label(
    df: DataFrame,
    target: str,
    horizon_s: int,
    entity: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    order_id: str = "event_id",
) -> DataFrame:
    """Label every row 1 if a ``target``-type event occurs for the same
    entity STRICTLY after it (in (ts, id) order) and within
    ``horizon_s`` seconds; also emit the exact time-to-event in integer
    microseconds (NULL when no future target exists at any horizon).

    Returns the input columns plus (label int, tte_micros bigint).
    ``tte_micros`` is the gap to the NEXT target regardless of horizon
    — so one pass supports re-labeling at any tighter horizon for free.
    """
    if horizon_s <= 0:
        raise ValueError(f"horizon_s must be positive, got {horizon_s}")
    mic = F.unix_micros(F.col(ts).cast("timestamp"))
    # reversed order: "preceding" rows are the entity's FUTURE; the
    # running last(ignorenulls) over the strict prefix is the next
    # target strictly after the current row — O(n), not O(n²)
    w_rev = (
        Window.partitionBy(entity)
        .orderBy(F.col(ts).desc(), F.col(order_id).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    next_t = F.last(
        F.when(F.col(type_col) == target, mic), ignorenulls=True
    ).over(w_rev)
    tte = (next_t - mic).alias("tte_micros")
    label = (
        F.when(
            next_t.isNotNull()
            & (next_t - mic <= F.lit(int(horizon_s) * 1_000_000)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("label")
    )
    return df.select(*df.columns, label, tte)


def weak_label_vote(
    docs: DataFrame,
    tokens_col: F.Column,
    rules: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Snorkel-style weak supervision: keyword labeling functions +
    majority vote → ``(id, label, n_votes, n_rules_hit)``.  Each rule
    is (term, label); a rule FIRES once per document containing the
    term (presence, not frequency — one spammy repeat must not outvote
    three independent signals).  The winning label is the modal vote;
    a tie ABSTAINS (label NULL) rather than guessing — abstention is
    the honest output a downstream label model consumes.  Documents
    hitting no rule emit nothing.

    Plan: per-doc DISTINCT (doc, term) pairs (map-side combined),
    broadcast join against the |rules|-row table, one (doc, label)
    count, then the modal/tie decision as TWO window functions over
    the votes frame (votes-sized, not corpus-sized) sharing one doc
    partitioning.  Deterministic end to end — no float, no rand.
    """
    spark = docs.sparkSession
    if not rules:
        raise ValueError("rules must be non-empty")
    rules_df = spark.createDataFrame(rules, "term string, label string")
    pairs = docs.select(
        F.col(id_col), F.explode(tokens_col).alias("term")
    ).distinct()
    votes = (
        pairs.join(F.broadcast(rules_df), "term")
        .groupBy(id_col, "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__v"))
    )
    w = Window.partitionBy(id_col)
    mx = F.max("__v").over(w)
    ties = F.sum(F.when(F.col("__v") == mx, 1).otherwise(0)).over(w)
    out = (
        votes.withColumn("__mx", mx)
        .withColumn("__ties", ties)
        .withColumn("__tot", F.sum("__v").over(w))
        .where(F.col("__v") == F.col("__mx"))
    )
    # one row per doc: on a tie all argmax rows collapse to the abstain
    # row via the min-label representative + NULL-out
    w2 = Window.partitionBy(id_col).orderBy("label")
    return (
        out.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            F.when(F.col("__ties") == 1, F.col("label")).alias("label"),
            F.col("__mx").alias("n_votes"),
            F.col("__tot").alias("n_rules_hit"),
        )
    )

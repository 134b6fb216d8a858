"""Point-in-time tool-usage features over agent transcripts.

The transcript schema carries a ``tool`` column (conv_id, turn_idx,
role, text, tool, ts): which tool an agent turn invoked, NULL for plain
turns. For agent-behavior modeling, the natural per-turn features are
"how tool-heavy has this conversation been SO FAR" — and like every
feature in kernel.py they must be point-in-time safe: computed from
turns STRICTLY BEFORE the current one, so a model scoring turn t never
peeks at t itself or its future.

Reference provenance: the reference worker walks one entity's ordered
keyframe stream and accumulates per-entity state as it goes
(data_handling.py:30-44 ordered timestamp index, worker.py:66-90 one
source_id per work unit); these are the corpus-scale PIT counters of
that walk, specialized to the transcript schema's ``tool`` column.

Features per turn:
  - tools_so_far      — prior turns that invoked any tool
  - distinct_tools_so_far — distinct tool names seen in prior turns
  - turns_since_tool  — current turn_idx minus the last prior tool
                        turn's turn_idx (NULL before the first tool use)

Scale: distinct-count-so-far is the expensive one naively (a running
set per row). It decomposes exactly into a running SUM of
first-occurrence flags: flag = 1 on the first (conv, tool) row in time
order (row_number over (conv_id, tool) == 1), then a prefix sum per
conv. The flag window comes FIRST in dataflow, so left to itself
Catalyst exchanges on (conv_id, tool) and then AGAIN on conv_id for
the prefix window — two shuffles. An explicit coarse pre-partition on
conv_id fixes it: HashPartitioning(conv_id) SATISFIES the finer
(conv_id, tool) clustering (Catalyst's subset rule — same plan fact
session_features relies on, where the coarse window happens to come
first), so the whole operator is ONE exchange + two sorts, zero
joins, pure whole-stage-codegen. Plan-audit-tested.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tool_usage_profile(
    tr: DataFrame,
    conv: str = "conv_id",
    tool: str = "tool",
    turn_idx: str = "turn_idx",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Per-turn PIT-safe tool-usage descriptors (see module doc).

    Returns (conv, turn_idx, tools_so_far, distinct_tools_so_far,
    turns_since_tool).
    """
    ob = [F.col(c) for c in order]
    w_tool_first = Window.partitionBy(conv, tool).orderBy(*ob)
    # first-ever use of this tool name in this conversation (tool
    # NULLs form their own window group; mask them out explicitly).
    # Staged select: a window expression cannot nest inside another
    # window's aggregate, so the flag materializes as a column first.
    base_cols = [conv, turn_idx, tool]
    base_cols += [c for c in order if c not in base_cols]
    # one coarse exchange up front; the subset rule satisfies both
    # window clusterings from it (see module doc)
    tr = tr.repartition(F.col(conv))
    flagged = tr.select(
        *base_cols,
        (
            F.col(tool).isNotNull()
            & (F.row_number().over(w_tool_first) == 1)
        )
        .cast("bigint")
        .alias("__first_use"),
    )

    w_prior = (
        Window.partitionBy(conv)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    has_tool = F.col(tool).isNotNull().cast("bigint")
    first_use = F.col("__first_use")
    last_tool_turn = F.last(
        F.when(F.col(tool).isNotNull(), F.col(turn_idx)), ignorenulls=True
    ).over(w_prior)

    return flagged.select(
        conv,
        turn_idx,
        F.coalesce(F.sum(has_tool).over(w_prior), F.lit(0))
        .cast("bigint")
        .alias("tools_so_far"),
        F.coalesce(F.sum(first_use).over(w_prior), F.lit(0))
        .cast("bigint")
        .alias("distinct_tools_so_far"),
        (F.col(turn_idx) - last_tool_turn)
        .cast("bigint")
        .alias("turns_since_tool"),
    )


def tool_trigrams(
    events: DataFrame,
    entity: str = "conv_id",
    action: str = "tool",
    order: tuple[str, str] = ("ts", "turn_idx"),
    k: int = 20,
) -> DataFrame:
    """Top-k 3-step action chains across conversations — the
    sequential-pattern view the first-order ``markov_transitions``
    cannot see (A→B→A retry loops and fixed tool litanies look
    unremarkable pairwise but dominate at depth 3). The
    agent-behavior miner for playbook discovery and loop auditing.

    Plan: ONE corpus hash(conv) exchange (collect_list + post-merge
    sort_array — partition-layout independent, the prefix_reuse
    idiom), trigrams built array-side (transform/slice — never a
    second window), explode to the trigram stream, map-side-combined
    counts, k-row TakeOrdered (count desc, chain asc) with the
    conversation-share micro.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order],
                F.coalesce(F.col(action).cast("string"), F.lit("")).alias(
                    "__a"
                ),
            )
        )
    )
    per_conv = events.groupBy(F.col(entity).alias("__e")).agg(
        F.transform(ordered, lambda x: x["__a"]).alias("__seq")
    )
    n_convs = per_conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    seq = F.col("__seq")
    n = F.size(seq)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " > ", seq[i], seq[i + 1], seq[i + 2]
    )
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(0), n - 3), gram),
    ).otherwise(F.array().cast("array<string>"))
    # distinct chains per conv for the share; raw occurrences for count
    per = per_conv.select(
        F.explode(grams).alias("chain"), F.col("__e")
    )
    counts = per.groupBy("chain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.count_distinct("__e").cast("bigint").alias("n_convs_with"),
    )
    top = counts.orderBy(
        F.col("n_occ").desc(), F.col("chain")
    ).limit(k)
    return top.crossJoin(F.broadcast(n_convs)).select(
        "chain",
        "n_occ",
        "n_convs_with",
        F.expr("n_convs_with * 1000000 DIV __n")
        .cast("bigint")
        .alias("conv_share_micro"),
    )

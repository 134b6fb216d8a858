"""Turn-level transcript→training-data operators.

The last mile of a transcript pipeline is reshaping turn streams into
model-ready examples: (prompt, response) pairs for SFT, fixed-size
rolling context windows for sequence models, and collapsing the
consecutive duplicate turns that retry loops leave behind. All three
are pure per-conversation window plans — they ride the SAME
hash(conv_id) exchange the feature kernel already pays, so in a fused
pipeline they are free of incremental shuffles; none uses a join or a
single byte of Python in the hot path.

Reference provenance: the reference worker's unit of work is one
source_id's ordered keyframe list (worker.py:66-90,
data_handling.py:31-44); these operators are the corpus-scale
generalization of "walk one conversation in order and emit training
records".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sft_pairs(
    tr: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """Extract adjacent (prompt, response) turn pairs: every
    ``response_role`` turn whose IMMEDIATELY preceding turn (stable
    per-conversation order) is a ``prompt_role`` turn becomes one
    supervised example. Non-adjacent pairs are deliberately excluded —
    an intervening tool/system turn changes what the response was
    conditioned on, so gluing across it would corrupt the example.

    Plan: one lag window per conversation — no self-join (the naive
    formulation joins the table to itself on turn_idx+1, a second
    corpus-wide shuffle and a hash probe per row; the lag is free on
    the per-entity exchange). Returns (conv, turn_idx of the response,
    prompt, response).
    """
    w = Window.partitionBy(conv).orderBy(*[F.col(c) for c in order])
    prev_role = F.lag(F.col(role)).over(w)
    prev_text = F.lag(F.col(text)).over(w)
    return (
        tr.select(
            conv,
            "turn_idx",
            F.col(role).alias("__r"),
            prev_role.alias("__pr"),
            prev_text.alias("prompt"),
            F.col(text).alias("response"),
        )
        .where((F.col("__r") == response_role) & (F.col("__pr") == prompt_role))
        .drop("__r", "__pr")
    )


def context_window(
    tr: DataFrame,
    k: int = 4,
    conv: str = "conv_id",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
    sep: str = "\n",
) -> DataFrame:
    """Rolling context assembly: each turn becomes one training row
    carrying the concatenation of its last ``k`` turns (inclusive) in
    stable order — the fixed-size context a next-turn model trains on.

    Plan: ``collect_list`` over a BOUNDED rows frame (k-1 preceding ..
    current) — bounded frames are the O(n·k) incremental class, never
    the O(n²) unbounded-following class (BENCH/BASELINE.md); one
    exchange, no join, no explode. Returns (conv, turn_idx, n_ctx,
    context) with ``context`` already flattened to one string so the
    row is sink-ready (and engine-comparable byte for byte).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = (
        Window.partitionBy(conv)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(k - 1), 0)
    )
    ctx = F.collect_list(F.coalesce(F.col(text), F.lit(""))).over(w)
    return tr.select(
        conv,
        "turn_idx",
        F.size(ctx).cast("int").alias("n_ctx"),
        F.array_join(ctx, sep).alias("context"),
    )


def collapse_repeats(
    tr: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Collapse CONSECUTIVE duplicate turns (same role AND same text as
    the immediately previous turn) — the artifact retry loops and
    double-submits leave in agent logs. Only adjacent repeats collapse;
    a legitimate later repetition of an earlier line survives (global
    dedup is a different operator, dedup.py). The FIRST occurrence of
    each run is kept, with the run length attached.

    Plan: lag marks run starts; a running sum of start-flags numbers the
    runs WITHOUT a join (the count then groups on (conv, run)); both
    windows and the aggregation cluster by conv_id, so the whole
    operator is one exchange. NULL text compares equal to NULL (eqNullSafe)
    — two consecutive empty turns are still a run.
    """
    ob = [F.col(c) for c in order]
    w = Window.partitionBy(conv).orderBy(*ob)
    same = F.col(role).eqNullSafe(F.lag(F.col(role)).over(w)) & F.col(
        text
    ).eqNullSafe(F.lag(F.col(text)).over(w))
    started = tr.select(
        conv,
        "turn_idx",
        role,
        text,
        *[c for c in dict.fromkeys(order) if c not in ("turn_idx",)],
        (~F.coalesce(same, F.lit(False))).cast("bigint").alias("__start"),
    )
    w_run = (
        Window.partitionBy(conv)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = started.select(
        conv,
        "turn_idx",
        role,
        text,
        F.col("__start"),
        F.sum("__start").over(w_run).alias("__run"),
        *[F.col(c) for c in dict.fromkeys(order) if c not in ("turn_idx",)],
    )
    return (
        runs.groupBy(conv, "__run")
        .agg(
            F.min(F.col("turn_idx")).alias("turn_idx"),
            F.any_value(F.col(role)).alias(role),
            F.any_value(F.col(text)).alias(text),
            F.count(F.lit(1)).cast("bigint").alias("n_repeats"),
        )
        .drop("__run")
    )


def negative_pairs(
    pairs: DataFrame,
    conv: str = "conv_id",
    idx: str = "turn_idx",
    prompt: str = "prompt",
    response: str = "response",
    n_shards: int = 8,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic in-batch negatives for contrastive training: each
    (prompt, response) example gains a ``neg_response`` drawn from a
    DIFFERENT example via a seeded ring shift — example i's negative is
    the response at position i+1 of its md5-shuffled shard (the last
    wraps to the shard head). The md5 permutation (sampling.sample_key)
    makes the pairing reproducible on any engine / partition layout and
    re-drawable per salt, unlike rand()-based negative mining.

    Plan: one narrow (key, shard) map + ONE hash exchange on shard +
    one per-shard sort (the shuffle_assign shape — no global sort; at
    100 TB raise n_shards so a shard fits a task's sort budget). lead
    + a shard-head first() over the running frame give the ring in two
    window expressions on the same sorted run. A single-example shard
    degenerates to neg == response (flagged by ``is_self``) — callers
    drop or re-salt those rather than silently training on a positive
    labeled negative.
    """
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        sample_key,
    )

    key = sample_key(
        F.concat_ws("|", F.col(conv), F.col(idx).cast("string")), salt
    )
    keyed = pairs.withColumn("__key", key).withColumn(
        "__shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("__shard").orderBy("__key", conv, idx)
    ring = F.coalesce(
        F.lead(F.col(response)).over(w), F.first(F.col(response)).over(w)
    )
    return keyed.select(
        conv,
        idx,
        prompt,
        response,
        ring.alias("neg_response"),
        (ring == F.col(response)).alias("is_self"),
    )


def role_alternation(
    tr: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    order: tuple[str, ...] = ("ts", "turn_idx"),
    dialogue_roles: tuple[str, str] = ("user", "assistant"),
) -> DataFrame:
    """Per-conversation structural validation — the chat-transcript
    curation gate. One row per conversation:

    - ``n_turns``, ``n_distinct_roles``
    - ``first_role`` / ``last_role`` (stable order)
    - ``n_role_repeats`` — turns whose role equals the immediately
      preceding turn's role (retry loops / double-submits; 0 for a
      well-formed dialogue)
    - ``n_offrole`` — turns outside ``dialogue_roles`` (tool/system/
      other interjections; a count, not a failure)
    - ``strict_alternation`` — no repeats AND every turn in
      ``dialogue_roles`` AND the first turn is ``dialogue_roles[0]``:
      the "clean SFT-able dialogue" flag trainers filter on.

    Plan: ONE exchange — the lag window partitions by conv, and the
    groupBy that follows reuses the same hash partitioning (no second
    shuffle; the window's output partitioning already satisfies the
    aggregation's distribution requirement). State per group is a few
    counters: safe at any conversation length.

    Reference provenance: the reference trusts its input ordering
    implicitly (data_handling.py walks one source's keyframes in list
    order); at corpus scale malformed conversations are the norm and
    this operator is the explicit filter in front of sft_pairs /
    context_window.
    """
    ob = [F.col(c) for c in order]
    w = Window.partitionBy(conv).orderBy(*ob)
    u, a = dialogue_roles
    lagged = tr.select(
        conv,
        F.col(role).alias("__r"),
        F.lag(F.col(role)).over(w).alias("__prev"),
        F.row_number().over(w).alias("__rn"),
    )
    is_repeat = F.col("__r").eqNullSafe(F.col("__prev")).cast("bigint")
    offrole = (~F.col("__r").isin(u, a)).cast("bigint")
    first_role = F.max(
        F.when(F.col("__rn") == 1, F.col("__r"))
    ).alias("first_role")
    last_role = F.max_by(F.col("__r"), F.col("__rn")).alias("last_role")
    agg = lagged.groupBy(conv).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.countDistinct("__r").cast("bigint").alias("n_distinct_roles"),
        first_role,
        last_role,
        F.sum(is_repeat).cast("bigint").alias("n_role_repeats"),
        F.sum(offrole).cast("bigint").alias("n_offrole"),
    )
    strict = (
        (F.col("n_role_repeats") == 0)
        & (F.col("n_offrole") == 0)
        & (F.col("first_role") == F.lit(u))
    )
    return agg.select(
        conv,
        "n_turns",
        "n_distinct_roles",
        "first_role",
        "last_role",
        "n_role_repeats",
        "n_offrole",
        strict.alias("strict_alternation"),
    )


def echo_rate(
    tr: DataFrame,
    conv: str = "conv_id",
    ts: str = "ts",
    turn_idx: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    target_role: str = "assistant",
) -> DataFrame:
    """Per-conversation echo (parroting) rate: for each ``target_role``
    turn, the containment of its DISTINCT token set in the immediately
    preceding turn's — |prev ∩ cur| / |cur|. An assistant that mostly
    restates the user scores near 1; SFT pairs mined from such
    conversations teach copying, not answering, so this is the
    curation gate that runs next to ``role_alternation`` before
    ``sft_pairs``.

    Exactness: token sets are order-independent (distinct + intersect
    sizes are pure set cardinalities), the per-turn rate is an
    integer-micro DIV, and the per-conv mean is ``Σ micro DIV pairs``
    — no floats anywhere.

    Plan: ONE conv exchange — the lag window and the per-conv rollup
    share the hash(conv) partitioning (no second shuffle); token
    split/distinct/intersect are JVM codegen array ops. Output:
    ``(conv_id, n_pairs, echo_avg_micro, echo_max_micro)``, one row
    per conversation that has at least one scored pair.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    w = Window.partitionBy("conv_id").orderBy("__ts", "__ti")
    lagged = tr.select(
        F.col(conv).alias("conv_id"),
        F.col(role).alias("__role"),
        F.col(ts).alias("__ts"),
        F.col(turn_idx).alias("__ti"),
        toks.alias("__t"),
    ).select(
        "conv_id",
        "__role",
        "__t",
        F.lag("__t").over(w).alias("__prev"),
    )
    scored = lagged.where(
        (F.col("__role") == target_role)
        & F.col("__prev").isNotNull()
        & (F.size("__t") > 0)
    ).select(
        "conv_id",
        F.expr(
            "size(array_intersect(__prev, __t)) * 1000000 DIV size(__t)"
        ).cast("bigint").alias("__m"),
    )
    return scored.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("sum(__m) DIV count(1)").cast("bigint").alias(
            "echo_avg_micro"
        ),
        F.max("__m").cast("bigint").alias("echo_max_micro"),
    )


def template_openers(
    tr: DataFrame,
    conv: str = "conv_id",
    ts: str = "ts",
    turn_idx: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    target_role: str = "assistant",
    k: int = 20,
) -> DataFrame:
    """Boilerplate-opener detection: the first ``target_role`` turn of
    every conversation is fingerprinted (md5 of its
    whitespace-normalized lowercase text) and the k most common
    openers are reported with their conversation share. A template
    that opens thousands of conversations ("Hello! How can I help…")
    adds no training signal and skews n-gram statistics — this report
    feeds the scrub list.

    Normalization: lower + \\s+→single-space + trim, so formatting
    variants collapse; the fingerprint is md5 (portable), the first
    16 hex chars kept for display next to a short prefix snippet.

    Plan: ONE conv exchange (min-(ts, turn_idx) first-turn selection
    via the struct-min trick — no row_number sort-per-group), then a
    map-side-combined fingerprint count and a k-row TakeOrdered
    (never a full sort). Output: ``(fp, n_convs, share_micro,
    snippet)``, k rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text), F.lit(""))), r"\s+", " "
        )
    )
    cand = tr.where(F.col(role) == target_role).select(
        F.col(conv).alias("conv_id"),
        F.struct(
            F.col(ts).alias("ts"),
            F.col(turn_idx).alias("ti"),
            norm.alias("txt"),
        ).alias("__s"),
    )
    first = cand.groupBy("conv_id").agg(F.min("__s").alias("__f")).select(
        F.col("__f.txt").alias("__txt")
    )
    counted = (
        first.groupBy("__txt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_convs"))
        .select(
            F.substring(F.md5(F.col("__txt")), 1, 16).alias("fp"),
            "n_convs",
            F.substring(F.col("__txt"), 1, 40).alias("snippet"),
        )
    )
    tot = counted.agg(F.sum("n_convs").cast("bigint").alias("__tot"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .select(
            "fp",
            "n_convs",
            F.expr("n_convs * 1000000 DIV __tot")
            .cast("bigint")
            .alias("share_micro"),
            "snippet",
        )
        .orderBy(F.desc("n_convs"), F.col("fp"))
        .limit(k)
    )


def retry_runs(
    tr: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Per-conversation retry-loop report: the aggregate view over the
    runs ``collapse_repeats`` collapses. A "run" is a maximal streak of
    consecutive turns with the same (role, text); a run of length >= 2
    is a retry loop (double-submit, tool-retry storm, agent stuck
    repeating itself). The report feeds a curation gate — conversations
    whose wasted share is high get dropped before ``sft_pairs``.

    Same islands plan as collapse_repeats (lag marks run starts, a
    running sum numbers runs, one count per run), then ONE more rollup
    per conversation — all three cluster on hash(conv), so the whole
    operator is a single exchange. NULL text equals NULL (eqNullSafe):
    two consecutive empty turns are still a run.

    Output, one row per conversation: ``(conv_id, n_turns, n_runs,
    n_retry_runs, max_run, wasted_turns)`` where wasted_turns =
    Σ (run_len - 1) over retry runs = turns a dedup-collapse would
    remove.
    """
    ob = [F.col(c) for c in order]
    w = Window.partitionBy(conv).orderBy(*ob)
    same = F.col(role).eqNullSafe(F.lag(F.col(role)).over(w)) & F.col(
        text
    ).eqNullSafe(F.lag(F.col(text)).over(w))
    started = tr.select(
        F.col(conv).alias("conv_id"),
        *[F.col(c) for c in dict.fromkeys(order)],
        (~F.coalesce(same, F.lit(False))).cast("bigint").alias("__start"),
    )
    w_run = (
        Window.partitionBy("conv_id")
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = started.select(
        "conv_id", F.sum("__start").over(w_run).alias("__run")
    )
    per_run = runs.groupBy("conv_id", "__run").agg(
        F.count(F.lit(1)).cast("bigint").alias("__len")
    )
    return per_run.groupBy("conv_id").agg(
        F.sum("__len").cast("bigint").alias("n_turns"),
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.sum((F.col("__len") >= 2).cast("bigint"))
        .cast("bigint")
        .alias("n_retry_runs"),
        F.max("__len").cast("bigint").alias("max_run"),
        F.sum(
            F.when(F.col("__len") >= 2, F.col("__len") - 1).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("wasted_turns"),
    )


def conv_outcomes(
    tr: DataFrame,
    conv: str = "conv_id",
    ts: str = "ts",
    turn_idx: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Conversation-outcome distribution: which role speaks LAST.
    A conversation ending on a user turn is abandoned (the question
    never got an answer — drop before SFT mining); ending on an
    assistant turn is answered; ending on tool/system is a crashed
    agent loop. One row per outcome role with the conversation count,
    corpus share, and mean length.

    Plan: struct-max last-turn selection per conversation (map-side
    combinable max over (ts, turn_idx, role) — no row_number
    sort-per-group, no window), then a |roles|-row rollup over the
    entity-sized relation with a broadcast total for the share. Two
    aggregations, zero joins on the corpus, zero windows. All ratios
    integer-micro DIV — no floats.

    Output: ``(outcome_role, n_convs, share_micro, turns_avg_micro)``.
    """
    last = tr.select(
        F.col(conv).alias("conv_id"),
        F.struct(
            F.col(ts).alias("ts"),
            F.col(turn_idx).alias("ti"),
            F.col(role).alias("role"),
        ).alias("__s"),
    ).groupBy("conv_id").agg(
        F.max("__s").alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    per_role = last.groupBy(
        F.col("__last.role").alias("outcome_role")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
        F.sum("__n").cast("bigint").alias("__turns"),
    )
    # Total via a whole-frame window over the |roles|-row aggregate
    # (domain-bounded, ≤ a handful of rows) instead of a broadcast
    # crossJoin of a re-derived total: the DataFrame branch re-executed
    # the entire per-conversation subtree a second time (two full
    # scan→exchange→aggregate chains in the plan) just to produce one
    # scalar.  Same integer DIV, bit-identical shares.
    return per_role.select(
        "outcome_role",
        "n_convs",
        F.expr(
            "n_convs * 1000000 DIV (sum(n_convs) OVER ("
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
        )
        .cast("bigint")
        .alias("share_micro"),
        F.expr("__turns * 1000000 DIV n_convs")
        .cast("bigint")
        .alias("turns_avg_micro"),
    )


def dedup_conversations(
    tr: DataFrame,
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Conversation-level exact dedup: two conversations are duplicates
    when their full (role, text) turn sequences are identical in
    stable order — the transcript-native analogue of dedup.exact_dedup
    (which digests one document's text). Scraped chat corpora carry
    whole duplicated conversations (mirrors, re-ingests); per-turn
    dedup can't see them because every turn also occurs in the twin.

    Digest: md5 over ``role<US>text`` payloads joined by <RS> in
    (ts, turn_idx) order. The stable order is re-established by
    sort_array AFTER the partial aggregation merges (same
    partition-layout independence argument as
    integrity.ordered_digest); NULL text digests as ''.

    Plan: one hash(conv) exchange for the per-conversation digest
    (map-side-combinable collect_list), then one window over the
    ENTITY-sized digest relation (hash(digest) exchange over
    |conversations| rows, never the corpus) for group size + keeper
    selection. Keeper = lexicographically smallest conv_id, so the
    choice is deterministic under any partitioning.

    Output, one row per conversation: ``(conv_id, digest, n_turns,
    group_size, is_keep)`` — filter ``is_keep = 1`` for the deduped
    corpus, ``group_size > 1`` for the duplicate report.
    """
    payload = F.concat_ws(
        "\x1f",
        F.col(role),
        F.coalesce(F.col(text), F.lit("")),
    )
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order], payload.alias("__p")
            )
        )
    )
    digests = (
        tr.groupBy(F.col(conv).alias("conv_id"))
        .agg(ordered.alias("__xs"))
        .select(
            "conv_id",
            F.size("__xs").cast("bigint").alias("n_turns"),
            F.md5(
                F.concat_ws(
                    "\x1e", F.transform("__xs", lambda x: x["__p"])
                )
            ).alias("digest"),
        )
    )
    wg = Window.partitionBy("digest")
    return digests.select(
        "conv_id",
        "digest",
        "n_turns",
        F.count(F.lit(1)).over(wg).cast("bigint").alias("group_size"),
        (F.col("conv_id") == F.min("conv_id").over(wg))
        .cast("int")
        .alias("is_keep"),
    )


def prefix_reuse(
    tr: DataFrame,
    depths: tuple[int, ...] = (1, 2, 4),
    conv: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Prefix-sharing report: at each depth d, how many conversations
    share their first-d-turn (role, text) prefix with at least one
    other conversation. This is the KV-cache / prefix-cache planning
    view for serving AND the system-prompt-explosion detector for
    training corpora (thousands of conversations opening with the
    identical injected preamble inflate n-gram stats; template_openers
    catches single-turn templates, this catches multi-turn ones).

    Plan: ONE corpus hash(conv) exchange (collect_list + post-merge
    sort_array — partition-layout independent like dedup_conversations),
    one projection computing ALL depth digests from the same sorted
    array (slice + md5, no re-aggregation per depth), one explode to
    |depths|·|convs| rows, one (depth, digest) exchange over that
    entity-sized frame, and a |depths|-row rollup. Conversations
    shorter than d use their full prefix (a 2-turn conv can still
    collide at d=4 with another 2-turn conv — both are "the whole
    conversation", which IS reuse).

    Output, one row per depth: ``(depth, n_convs, n_reused,
    reuse_share_micro, n_prefixes)``.
    """
    if not depths or any(d < 1 for d in depths):
        raise ValueError(f"depths must be >= 1: {depths}")
    payload = F.concat_ws(
        "\x1f", F.col(role), F.coalesce(F.col(text), F.lit(""))
    )
    ordered = F.sort_array(
        F.collect_list(
            F.struct(*[F.col(c) for c in order], payload.alias("__p"))
        )
    )
    per_conv = tr.groupBy(F.col(conv).alias("conv_id")).agg(
        ordered.alias("__xs")
    )
    digest_at = lambda d: F.md5(  # noqa: E731
        F.concat_ws(
            "\x1e",
            F.transform(
                F.slice("__xs", 1, d), lambda x: x["__p"]
            ),
        )
    )
    exploded = per_conv.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("depth"),
                        digest_at(d).alias("digest"),
                    )
                    for d in depths
                ]
            )
        ).alias("__e")
    ).select("__e.depth", "__e.digest")
    groups = exploded.groupBy("depth", "digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("__g")
    )
    return (
        groups.groupBy("depth")
        .agg(
            F.sum("__g").cast("bigint").alias("n_convs"),
            F.sum(F.when(F.col("__g") >= 2, F.col("__g")).otherwise(0))
            .cast("bigint")
            .alias("n_reused"),
            F.count(F.lit(1)).cast("bigint").alias("n_prefixes"),
        )
        .select(
            "depth",
            "n_convs",
            "n_reused",
            F.expr("n_reused * 1000000 DIV n_convs")
            .cast("bigint")
            .alias("reuse_share_micro"),
            "n_prefixes",
        )
    )


def length_drift(
    tr: DataFrame,
    conv: str = "conv_id",
    turn_idx: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Per-conversation OLS slope of turn length (tokens) over
    turn_idx — the degeneracy detector that complements ``echo_rate``:
    a strongly negative slope means the exchange is collapsing into
    one-word turns (disengagement, agent giving up); strongly positive
    means runaway verbosity. Curation gates drop the tails before
    ``sft_pairs``.

    Exactness: the five regression moments (n, Σi, Σi², Σl, Σil)
    accumulate exact decimal(38,0) — n·Σil overflows int64 at 10⁵-turn
    conversations — then ONE double divide with floor-1e-6 micro (the
    cohen_kappa convention). Zero-variance index (single-turn conv)
    → NULL slope.

    Plan: one map-side-combined aggregation on hash(conv) — no window,
    no sort (OLS moments are order-free); token counting is a JVM
    codegen array op.
    """
    i = F.col(turn_idx).cast("decimal(38,0)")
    toklen = F.size(
        F.filter(
            F.split(
                F.lower(F.coalesce(F.col(text), F.lit(""))), r"\s+"
            ),
            lambda t: t != "",
        )
    ).cast("decimal(38,0)")
    m = tr.groupBy(F.col(conv).alias("conv_id")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(i).alias("__si"),
        F.sum(i * i).alias("__sii"),
        F.sum(toklen).alias("__sl"),
        F.sum(i * toklen).alias("__sil"),
    )
    num = (F.col("__n") * F.col("__sil") - F.col("__si") * F.col("__sl")).cast(
        "double"
    )
    den = (
        F.col("__n") * F.col("__sii") - F.col("__si") * F.col("__si")
    ).cast("double")
    return m.select(
        "conv_id",
        F.col("__n").cast("bigint").alias("n_turns"),
        F.col("__sl").cast("bigint").alias("n_tokens"),
        F.when(den > 0, F.floor(num / den * 1e6) / 1e6).alias("slope"),
    )


def truncation_loss(
    df: DataFrame,
    entity: str = "conv_id",
    tokens_col: str = "n_tokens",
    limits: tuple[int, ...] = (2048, 8192, 32768),
) -> DataFrame:
    """Context-window truncation planning table: for each candidate
    limit L, how many conversations exceed it and what share of
    TOKENS a hard tail-truncation at L would drop — the table that
    decides the serving/training context length (and whether
    ``sequence_pack`` should split long conversations instead of
    truncating). ``context_window`` builds the windows; this prices
    the cut.

    Exactness: all integer sums; shares are integer-micro DIV.
    Plan: ONE map-side-combined entity rollup (the corpus never
    shuffles full rows), a |limits|-element explode over the
    entity-sized frame, a |limits|-row final rollup.
    """
    if not limits or any(l <= 0 for l in limits):
        raise ValueError("limits must be positive and non-empty")
    per = df.groupBy(F.col(entity).alias("__e")).agg(
        F.sum(F.col(tokens_col).cast("bigint"))
        .cast("bigint")
        .alias("__tok")
    )
    lim = F.explode(
        F.array(*[F.lit(int(l)) for l in sorted(limits)])
    ).alias("limit")
    fanned = per.select("__tok", lim)
    agg = fanned.groupBy("limit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
        F.sum((F.col("__tok") > F.col("limit")).cast("bigint"))
        .cast("bigint")
        .alias("n_over"),
        F.sum("__tok").cast("bigint").alias("total_tokens"),
        F.sum(
            F.greatest(F.col("__tok") - F.col("limit"), F.lit(0))
        )
        .cast("bigint")
        .alias("tokens_lost"),
    )
    return agg.select(
        "limit",
        "n_convs",
        "n_over",
        F.expr("n_over * 1000000 DIV n_convs")
        .cast("bigint")
        .alias("over_share_micro"),
        "total_tokens",
        "tokens_lost",
        F.when(
            F.col("total_tokens") > 0,
            F.expr("tokens_lost * 1000000 DIV total_tokens"),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("lost_share_micro"),
    )

"""Point-in-time (as-of) join — the flagship operator.

Generalizes the reference's interval/timestamp lookup
(reference: data_handling.py:121-129 ``find_shot_for_timestamp`` — for a
probe timestamp, select the matching row from a second table; first hit
wins; sentinel on no hit) to the degenerate point-event case: for each
left anchor row, the single latest right row with ``right.ts <=
left.ts`` within the same entity. Strict ``<=`` is the zero-temporal-
leakage rule (BASELINE.json north_rule).

Two physical strategies, same semantics:

1. ``asof_join_rangejoin`` — declarative Catalyst plan: inequality join +
   window dedup. Oracle-checkable, good when the right side per entity is
   small or the join is broadcastable. At scale an unconstrained range
   join can explode (anchor × all-earlier-rows), so it is the
   *correctness* path.

2. ``asof_join_sorted`` — the scale path: cogrouped ``applyInPandas``
   over the entity key running ``pandas.merge_asof`` per group. One
   shuffle on the entity key for each side, then a linear merge per
   group (Arrow-batched, vectorized — the analogue of the reference's
   batched vectorized kernel, feature_extraction.py:17-32). Spark never
   splits one group across tasks, so no partition-boundary state is
   needed; skew is handled by AQE for the shuffle and (for pathological
   single-entity skew) the salted pre-aggregation in joins.py.

Tie-break: among right rows sharing the max ts <= anchor, the one with
the greatest ``right_order`` column wins (deterministic, mirrors the
reference's deterministic first-hit rule data_handling.py:124-126 but
"latest state" oriented).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_rangejoin(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    left_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Declarative as-of join: left ⟕ latest right with right.ts <= left.ts.

    ``left_keys``: columns that uniquely key a left row (for the dedup
    window). Defaults to (on, left_ts) which is only safe if unique.
    Right columns are kept with their own names; the right timestamp is
    exposed as ``matched_ts``.
    """
    lk = list(left_keys) if left_keys else [on, left_ts]
    r = right.select(
        F.col(on).alias("__r_key"),
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in right.columns if c not in (on, right_ts)],
    )
    order = [F.col("matched_ts").desc()]
    if right_order:
        order.append(F.col(right_order).desc())
    joined = left.join(
        r,
        (left[on] == r["__r_key"]) & (r["matched_ts"] <= left[left_ts]),
        "left",
    ).drop("__r_key")
    w = Window.partitionBy(*[F.col(c) for c in lk]).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join_sorted(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Scale-path as-of join: bucket-cogrouped ``pandas.merge_asof``.

    Entities are hashed into ``n_buckets`` buckets and the cogroup runs
    per BUCKET, not per entity: pyspark's grouped-pandas machinery costs
    ~20-50 ms per group in serialization/setup, so grouping by raw
    entity key (millions of small groups at corpus scale) drowns the
    actual merge. Per bucket, ``merge_asof(by=on)`` does the per-entity
    as-of matching vectorized in one call. Bucket count bounds per-task
    memory (bucket ≈ corpus/n_buckets); entity groups never split across
    buckets, so no partition-boundary state is needed.

    Zero leakage: direction='backward' + allow_exact_matches=True ⇒
    matched_ts <= anchor ts, strictly nothing after the anchor.
    Tie-break: among equal matched_ts within an entity the greatest
    ``right_order`` wins (rows sorted ascending; merge_asof takes the
    last positioned match).
    """
    if n_buckets is None:
        # size buckets from the session's parallelism, not a constant:
        # r1's fixed 2048 buckets paid ~2048x cogroup/pandas setup at
        # small SF (bench-dominant, VERDICT r1). 4x shuffle partitions
        # balances skew while keeping per-group overhead amortized;
        # callers with huge corpora pass an explicit count to bound
        # per-task memory instead.
        sp = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        n_buckets = max(4 * sp, 64)
    l_cols = left.columns
    r_extra = [c for c in right.columns if c not in (on, right_ts)]
    lb = left.withColumn("__b", F.pmod(F.xxhash64(F.col(on)), F.lit(n_buckets)))
    # fresh key name on the right avoids self-join lineage ambiguity when
    # left was derived from right (common: anchors = agg of transcripts)
    r = right.select(
        F.col(on).alias("__r_on"),
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in r_extra],
    ).withColumn("__b", F.pmod(F.xxhash64(F.col("__r_on")), F.lit(n_buckets)))
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + ["`matched_ts` timestamp"]
        + [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in r.schema.fields
            if f.name not in ("__r_on", "matched_ts", "__b")
        ]
    )
    order_cols = ["matched_ts"] + ([right_order] if right_order else [])

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
        if rdf.empty:
            out = ldf.copy()
            out["matched_ts"] = pd.NaT
            for c in r_extra:
                out[c] = None
            return out[l_cols + ["matched_ts"] + r_extra]
        # stable sort by ts (merge_asof contract), tie-break column last
        # so the LAST positioned row among equal ts is the winner
        rdf = rdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        out = pd.merge_asof(
            ldf,
            rdf.drop(columns=["__b"]),
            left_on=left_ts,
            right_on="matched_ts",
            left_by=on,
            right_by="__r_on",
            direction="backward",  # matched_ts <= ts: zero leakage
            allow_exact_matches=True,
        )
        return out[l_cols + ["matched_ts"] + r_extra]

    return lb.groupBy("__b").cogroup(r.groupBy("__b")).applyInPandas(
        merge, schema=out_schema
    )


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_order: str | None,
):
    """Shared construction for the union-window as-of family: right
    rows tagged 0 with their payload struct, left (anchor) rows tagged
    1, unioned, with an xxhash64 numeric key prefix (distinct 8-byte
    prefixes restore the sorter's prefix comparator on string keys —
    measured sort drag at 30M+ rows; the raw key stays in the
    partition spec so hash collisions cannot merge entities). Returns
    ``(unioned, left_cols, right_payload_cols)``."""
    l_cols = list(left.columns)
    r_extra = [c for c in right.columns if c not in (on, right_ts)]
    ordcol = (
        F.col(right_order).cast("bigint")
        if right_order
        else F.lit(0).cast("bigint")
    )
    r_side = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        ordcol.alias("__ord"),
        F.struct(
            F.col(right_ts).alias("matched_ts"),
            *[F.col(c) for c in r_extra],
        ).alias("__r"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    l_side = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("bigint").alias("__ord"),
        F.lit(None)
        .cast(r_side.schema["__r"].dataType)
        .alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
    )
    u = r_side.unionByName(l_side).withColumn("__kh", F.xxhash64("__k"))
    return u, l_cols, r_extra


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Pure-JVM as-of join: union + running ``last(ignorenulls)``.

    ``tolerance_seconds`` bounds match staleness (pandas
    ``merge_asof(tolerance=...)``): an anchor whose latest match is
    older than the tolerance gets NULL right columns — and since the
    running-last match is the NEWEST candidate <= anchor, any other
    candidate is older still, so nulling it is exactly the
    windowed-join semantics. Pure post-predicate on the matched
    struct; the plan shape (one shuffle + one sort) is unchanged.

    The classic distributed sort-merge as-of formulation: tag right
    rows 0 and left (anchor) rows 1, union them, and take — per entity,
    ordered by (ts, tag, right_order) — the running last non-null right
    payload. Each anchor then carries the latest right row with
    ``right.ts <= left.ts`` (right rows sort before anchors at equal
    ts ⇒ exact matches allowed; later right_order sorts later ⇒ wins
    the tie; zero temporal leakage by construction).

    ONE shuffle (hash on the entity key) + one sort, all whole-stage
    codegen — no Python, no Arrow transfer. This is the default scale
    path; ``asof_join_sorted`` (cogrouped merge_asof) and
    ``asof_join_rangejoin`` are the verified alternatives. Skew: a hot
    entity is one sort run inside a partition (linear scan), and AQE
    skew-split handles oversized shuffle blocks.

    Output schema matches the other two paths: left columns +
    ``matched_ts`` + right payload columns.
    """
    u, l_cols, r_extra = _tagged_union(
        left, right, on, left_ts, right_ts, right_order
    )
    w = (
        Window.partitionBy("__kh", "__k")
        .orderBy("__ts", "__tag", "__ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__tag") == 1
    )
    if tolerance_seconds is not None:
        fresh = F.col("__m").isNotNull() & (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__m.matched_ts").cast("timestamp"))
            <= int(tolerance_seconds * 1_000_000)
        )
        matched = matched.withColumn("__m", F.when(fresh, F.col("__m")))
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        F.col("__m.matched_ts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in r_extra],
    )


def pit_snapshot(
    df: DataFrame,
    cutoff,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("event_type", "value"),
) -> DataFrame:
    """Point-in-time snapshot: the latest row per entity at or before
    ``cutoff`` — the feature-store "serve features as of T" read, and
    the degenerate (single-anchor) as-of join.

    Plan: filter to ts <= cutoff (pushed to the scan; on a
    ts-partitioned table this prunes partitions), then ONE
    partial+final ``max_by(struct(...), struct(ts, tiebreak))``
    aggregation around a single exchange — algebraic and map-side
    combined, so the shuffle carries one candidate row per
    (partition, entity), never the history (plan-audit test). The
    physical operator is SortAggregate, not HashAggregate (struct-
    typed aggregation buffers aren't hash-aggregable in Spark) — a
    per-partition sort on the entity key, NOT a window over the
    history; the shuffle-volume story is unchanged. No global sort.
    Ties at the same timestamp resolve by greatest struct order of
    the remaining columns, deterministically.

    Reference provenance: the reference serves "current state per
    entity" by overwriting per-entity output dirs (io_util.py); this
    is that read path as one aggregation, with the anchor made
    explicit so training-time and serve-time features agree (zero
    temporal leakage by construction: rows after cutoff never enter
    the plan).
    """
    vals = [F.col(c) for c in value_cols]
    pick = F.struct(F.col(ts_col), *vals)
    return (
        df.where(F.col(ts_col) <= cutoff)
        .groupBy(entity_col)
        .agg(F.max_by(pick, pick).alias("__r"))
        .select(
            entity_col,
            F.col(f"__r.{ts_col}").alias(ts_col),
            *[F.col(f"__r.{c}").alias(c) for c in value_cols],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each anchor takes whichever of its latest-past or
    earliest-future right row is closer in time; equal distances break
    BACKWARD (the pandas rule — and the leakage-conservative choice).
    Within a side, ties at the same timestamp resolve exactly like the
    backward path: backward takes the greatest ``right_order``, forward
    the least at the earliest future instant.

    Same physical shape as ``asof_join_union`` — ONE shuffle, with two
    RUNNING frames over it: ``last(ignorenulls)`` up to the anchor in
    ascending order (backward) and ``last(ignorenulls)`` up to the
    anchor in DESCENDING order (forward — the next row in ascending
    time is the latest-seen row in a reverse scan). Both frames are
    unbounded-PRECEDING running accumulators, i.e. O(n) per entity;
    the naive forward formulation (``first`` over an
    unbounded-FOLLOWING frame) looks equivalent but Spark recomputes
    that frame from each row position — O(n²) per entity, measured
    unfinishable at 200k rows/entity. Cost of the reverse scan is one
    extra Sort reusing the same exchange. Same-ts right rows sort
    after the anchor in the reverse order, so the forward candidate
    is strictly later by construction — they'd lose to the gap-0
    backward match anyway. The gap comparison is exact integer
    microseconds.

    Use where the anchor is an observation time rather than a feature
    cutoff (nearest-frame alignment, sensor fusion). NOT for training
    features: the forward candidate reads the future by construction.
    """
    u, l_cols, r_extra = _tagged_union(
        left, right, on, left_ts, right_ts, right_order
    )
    w_back = (
        Window.partitionBy("__kh", "__k")
        .orderBy("__ts", "__tag", "__ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("__kh", "__k")
        .orderBy(F.desc("__ts"), F.desc("__tag"), F.desc("__ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    anchors = (
        u.withColumn("__b", F.last("__r", ignorenulls=True).over(w_back))
        .withColumn("__f", F.last("__r", ignorenulls=True).over(w_fwd))
        .where(F.col("__tag") == 1)
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    back_gap = us(F.col("__ts")) - us(F.col("__b.matched_ts"))
    fwd_gap = us(F.col("__f.matched_ts")) - us(F.col("__ts"))
    pick = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(back_gap <= fwd_gap, F.col("__b"))
        .otherwise(F.col("__f"))
    )
    anchors = anchors.withColumn("__m", pick)
    return anchors.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        F.col("__m.matched_ts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in r_extra],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Forward as-of join: each anchor takes the EARLIEST right row
    strictly after it (``matched_ts > ts``) — "the next event": the
    conversion-attribution / time-to-next-action primitive (first
    purchase after each click, next error after each deploy).
    ``tolerance_seconds`` bounds the lookahead: a match farther than
    the tolerance nulls out, so "conversion within 30 minutes" is the
    tolerance form. Strictly-after is deliberate (a simultaneous event
    is not a *next* event); ties at the earliest future instant take
    the least ``right_order``.

    Same physical shape as the whole union-window family: ONE shuffle,
    then a running ``last(ignorenulls)`` over the REVERSE time order —
    the next row in ascending time is the latest-seen row in a reverse
    scan, an O(n) unbounded-preceding accumulator (the naive
    ``first`` over an unbounded-FOLLOWING frame is O(n²) per entity in
    Spark — recomputed from every row position — measured
    unfinishable at 200k rows/entity; see ``asof_join_nearest``).
    Same-ts right rows sort after the anchor in the reverse order, so
    the match is strictly later by construction. Exact
    integer-microsecond tolerance.
    """
    u, l_cols, r_extra = _tagged_union(
        left, right, on, left_ts, right_ts, right_order
    )
    w_fwd = (
        Window.partitionBy("__kh", "__k")
        .orderBy(F.desc("__ts"), F.desc("__tag"), F.desc("__ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    anchors = u.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w_fwd)
    ).where(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        fresh = F.col("__m").isNotNull() & (
            F.unix_micros(F.col("__m.matched_ts").cast("timestamp"))
            - F.unix_micros(F.col("__ts").cast("timestamp"))
            <= int(tolerance_seconds * 1_000_000)
        )
        anchors = anchors.withColumn("__m", F.when(fresh, F.col("__m")))
    return anchors.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        F.col("__m.matched_ts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in r_extra],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    block_seconds: float = 86_400.0,
) -> DataFrame:
    """Skew-safe as-of join: the hot-conversation twin of
    ``asof_join_union`` (north rule: salted-key skew mitigation). The
    plain union-window plan serializes each entity into ONE task's
    sort+scan — a conversation with 10^8 turns is a straggler no
    matter the cluster size (AQE cannot split a window partition).
    Same time-block decomposition as ``salted_running_sum``:

    1. salt by TIME RANGE (``block = floor(epoch(ts)/block_seconds)``)
       and run the running-last match within each (entity, block)
       partition — parallel across blocks of the same entity;
    2. one summary row per (entity, block): the last right payload of
       the block (``max_by`` over right rows only — anchors excluded
       by a null ordering key, so empty blocks yield null);
    3. a tiny window over block summaries carries the latest match
       across STRICTLY earlier blocks; anchors whose block has no
       earlier right row coalesce to the carry-in.

    Output is row-identical to ``asof_join_union`` (asserted in tests
    and by sharing its oracle): the in-block match IS the global match
    whenever the block contains any right row at or before the
    anchor, and otherwise the carry-in is exactly the latest right row
    of all earlier blocks. Choose ``block_seconds`` so a hot entity's
    densest block fits a task (blocks ≈ entity span / block_seconds);
    cold entities pay one extra tiny join — route on a count rollup
    (``skew_report``) exactly like ``auto_salt_prefix_features``.
    """
    u, l_cols, r_extra = _tagged_union(
        left, right, on, left_ts, right_ts, right_order
    )
    from dane_visual_feature_extraction_worker_spark.functions import (
        epoch_seconds,
    )

    u = u.withColumn(
        "__blk",
        F.floor(epoch_seconds("__ts") / F.lit(float(block_seconds))).cast(
            "bigint"
        ),
    )
    w_in = (
        Window.partitionBy("__kh", "__k", "__blk")
        .orderBy("__ts", "__tag", "__ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = u.withColumn("__m_in", F.last("__r", ignorenulls=True).over(w_in))
    # right-rows-only argmax per block: a null ordering key makes
    # max_by skip anchor rows entirely
    right_ord = F.when(
        F.col("__tag") == 0, F.struct(F.col("__ts"), F.col("__ord"))
    )
    summaries = u.groupBy("__kh", "__k", "__blk").agg(
        F.max_by("__r", right_ord).alias("__blk_last")
    )
    w_blk = (
        Window.partitionBy("__kh", "__k")
        .orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.withColumn(
        "__carry", F.last("__blk_last", ignorenulls=True).over(w_blk)
    ).select("__kh", "__k", "__blk", "__carry")
    anchors = (
        intra.where(F.col("__tag") == 1)
        .join(carry, ["__kh", "__k", "__blk"])
        .withColumn("__m", F.coalesce(F.col("__m_in"), F.col("__carry")))
    )
    return anchors.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        F.col("__m.matched_ts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in r_extra],
    )


def asof_join_routed(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    hot_threshold: int = 1_000_000,
    block_seconds: float = 86_400.0,
) -> DataFrame:
    """Count-routed as-of: plain union-window for the cold majority,
    time-block salted twin for entities whose COMBINED (left + right)
    row count reaches ``hot_threshold`` — the same wired routing rule
    as ``auto_salt_prefix_features`` (r4 VERDICT precedent), applied
    to the flagship join. One cheap map-side-combined count per side
    finds the hot set (≤ rows/threshold entities, always
    broadcastable); the split is broadcast semi/anti, the slices run
    their own plans, and the union is exact because salted is
    row-identical to plain (``asof_join_salted`` docstring)."""
    counts = (
        left.select(F.col(on).alias("__e"))
        .unionAll(right.select(F.col(on).alias("__e")))
        .groupBy("__e")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    hot_keys = counts.where(F.col("__n") >= hot_threshold).select(
        F.col("__e").alias(on)
    )
    kw = dict(on=on, left_ts=left_ts, right_ts=right_ts,
              right_order=right_order)
    cold = asof_join_union(
        left.join(F.broadcast(hot_keys), on, "left_anti"),
        right.join(F.broadcast(hot_keys), on, "left_anti"),
        **kw,
    )
    hot = asof_join_salted(
        left.join(F.broadcast(hot_keys), on, "left_semi"),
        right.join(F.broadcast(hot_keys), on, "left_semi"),
        block_seconds=block_seconds,
        **kw,
    ).select(*cold.columns)
    return cold.unionByName(hot)


def resample_ffill(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Regular-grid resampling with forward fill: for each entity, emit
    one row per ``step_seconds`` tick between its first and last event
    (ticks aligned to epoch multiples of the step), carrying the latest
    observed value at-or-before the tick — the gap-filler that turns
    irregular event streams into the fixed-cadence matrix
    sequence models and joins against other regular series expect.
    The degenerate self-as-of case: every grid tick is an as-of probe
    into the entity's own history (strict ``<=``, the zero-leakage
    rule shared with the flagship join).

    Returns ``(entity, tick, value_ffill_cents)``: tick = epoch
    seconds (bigint, a step multiple), value forward-filled as exact
    cents (NULL only when an entity's first tick precedes any event —
    impossible here since ticks start at ceil(first/step), so every
    tick has a predecessor).

    Plan: per-entity bounds from ONE map-side-combined groupBy;
    ``sequence()`` explodes the tick range NARROWLY (no shuffle — grid
    rows are generated inside the partition holding the entity's
    bounds row); events collapse to one value per (entity, ts) —
    deterministic max, documented — then grid and events union and a
    single ``last(ignorenulls)`` running window over (entity) fills
    forward.  Two corpus-key exchanges total (bounds agg + the window
    sort); never a range join, never a per-tick probe join.  Grid
    size is bounded by span/step per entity — size the step so
    span/step stays O(10⁴) per entity at the target scale (the same
    contract a time-series store's downsampler imposes).
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    sec = F.col(ts_col).cast("timestamp").cast("double")
    ts_l = F.floor(sec).cast("bigint")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    ev = (
        df.select(
            F.col(entity_col).alias("entity"),
            ts_l.alias("__ts"),
            cents.alias("__cents"),
        )
        .groupBy("entity", "__ts")
        .agg(F.max("__cents").alias("__cents"))
    )
    step = F.lit(step_seconds).cast("bigint")
    bounds = ev.groupBy("entity").agg(
        F.min("__ts").alias("__mn"), F.max("__ts").alias("__mx")
    )
    first_tick = (
        F.expr(f"(__mn + {step_seconds} - 1) DIV {step_seconds}") * step
    ).cast("bigint")
    last_tick = (F.expr(f"__mx DIV {step_seconds}") * step).cast("bigint")
    grid = bounds.where(last_tick >= first_tick).select(
        "entity",
        F.explode(
            F.sequence(first_tick, last_tick, step)
        ).alias("__ts"),
        F.lit(None).cast("bigint").alias("__cents"),
        F.lit(1).alias("__is_grid"),
    )
    union = ev.withColumn("__is_grid", F.lit(0)).unionByName(grid)
    w = (
        Window.partitionBy("entity")
        .orderBy("__ts", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        union.withColumn(
            "value_ffill_cents", F.last("__cents", ignorenulls=True).over(w)
        )
        .where(F.col("__is_grid") == 1)
        .select(
            "entity",
            F.col("__ts").alias("tick"),
            "value_ffill_cents",
        )
    )


def resample_linear(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Regular-grid LINEAR-interpolation resampler — the smooth twin
    of ``resample_ffill``: each epoch-aligned tick carries
    v_prev + (v_next − v_prev)·(t − t_prev) DIV (t_next − t_prev),
    the straight line between the surrounding observations.  Forward
    fill is right for state-like series (last price holds); linear is
    right for flow-like ones (cumulative counters, sensor levels)
    where a step function fabricates plateaus.  Ticks exactly on an
    observation return it unchanged; the interpolation is EXACT
    integer arithmetic (cents·µs products, one truncating DIV per
    tick — engine-portable, ±1 cent flooring documented).

    Plan: identical shape to resample_ffill — bounds agg, narrow
    ``sequence()`` grid, grid∪events union — plus ONE extra pair of
    running windows (backward last + forward first, both ignorenulls,
    over the SAME entity exchange; Catalyst shares the sort).  Two
    entity exchanges total, zero joins, never a per-tick probe.
    Interior ticks only by construction (first tick ≥ first event,
    last tick ≤ last event), so both neighbors always exist.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    sec = F.col(ts_col).cast("timestamp").cast("double")
    ts_l = F.floor(sec).cast("bigint")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    ev = (
        df.select(
            F.col(entity_col).alias("entity"),
            ts_l.alias("__ts"),
            cents.alias("__cents"),
        )
        .groupBy("entity", "__ts")
        .agg(F.max("__cents").alias("__cents"))
    )
    step = F.lit(step_seconds).cast("bigint")
    bounds = ev.groupBy("entity").agg(
        F.min("__ts").alias("__mn"), F.max("__ts").alias("__mx")
    )
    first_tick = (
        F.expr(f"(__mn + {step_seconds} - 1) DIV {step_seconds}") * step
    ).cast("bigint")
    last_tick = (F.expr(f"__mx DIV {step_seconds}") * step).cast("bigint")
    grid = bounds.where(last_tick >= first_tick).select(
        "entity",
        F.explode(F.sequence(first_tick, last_tick, step)).alias("__ts"),
        F.lit(None).cast("bigint").alias("__cents"),
        F.lit(1).alias("__is_grid"),
    )
    union = ev.withColumn("__is_grid", F.lit(0)).unionByName(grid)
    back = (
        Window.partitionBy("entity")
        .orderBy("__ts", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward neighbors via a DESC-ordered *running* frame, not a
    # [current, unbounded following] frame: Spark executes shrinking
    # frames with UnboundedFollowingWindowFunctionFrame, which
    # re-aggregates the remainder of the partition for EVERY row —
    # O(n²) per entity — while a running (growing) frame accumulates
    # in O(n).  last(ignorenulls) over (ts DESC, is_grid DESC) rows
    # [start, current] is exactly first(ignorenulls) over
    # (ts ASC, is_grid ASC) rows [current, end] — the same nearest
    # at-or-after non-null, current row included.  Cost: one extra
    # in-partition sort on the SAME entity exchange (Catalyst keeps a
    # single Exchange; the second Window just re-sorts its partition).
    fwd_rev = (
        Window.partitionBy("entity")
        .orderBy(F.col("__ts").desc(), F.col("__is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = (
        union.withColumn("__pv", F.last("__cents", ignorenulls=True).over(back))
        .withColumn(
            "__pt",
            F.last(
                F.when(F.col("__cents").isNotNull(), F.col("__ts")),
                ignorenulls=True,
            ).over(back),
        )
        .withColumn(
            "__nv", F.last("__cents", ignorenulls=True).over(fwd_rev)
        )
        .withColumn(
            "__nt",
            F.last(
                F.when(F.col("__cents").isNotNull(), F.col("__ts")),
                ignorenulls=True,
            ).over(fwd_rev),
        )
    )
    interp = F.when(F.col("__nt") == F.col("__pt"), F.col("__pv")).otherwise(
        F.expr(
            "CAST(__pv + (__nv - __pv) * (__ts - __pt)"
            " DIV (__nt - __pt) AS BIGINT)"
        )
    )
    return (
        annotated.where(F.col("__is_grid") == 1)
        .select(
            "entity",
            F.col("__ts").alias("tick"),
            interp.cast("bigint").alias("value_interp_cents"),
        )
    )

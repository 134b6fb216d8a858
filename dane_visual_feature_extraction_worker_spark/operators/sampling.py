"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs reproducible row selection: seeded
`rand()` differs across engines, Spark versions, and even partition
layouts, so none of it is auditable. These operators derive a uniform
32-bit key from ``md5(salt | id)`` — pure column expressions, identical
on any engine (the DuckDB oracles replay them digit-for-digit), stable
under repartitioning, and independent per salt. Comparisons are
INTEGER (key < floor(rate * 2^32)) — no float boundary anywhere.

At 100 TB: narrow map over the scan (no shuffle, no sort, no global
sample pass); changing the salt re-draws the sample without touching
the data; split membership is a pure function of the row id, so
train/val/test assignment is reproducible across runs and clusters —
the property leakage audits depend on.

Reference provenance: the reference selects work deterministically by
entity id (one source_id per queue message, worker.py:66-90); these
operators are the corpus-scale generalization of "which rows does this
run own".
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: key space: first 8 md5 hex digits = 32 uniform bits
SAMPLE_SPACE = 1 << 32


def sample_key(col: F.Column, salt: str = "sample") -> F.Column:
    """Uniform int64 in [0, 2^32) from md5(salt|value) — the portable
    per-row randomness primitive."""
    hx = F.md5(F.concat_ws("|", F.lit(salt), col.cast("string")))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * SAMPLE_SPACE)


def sample_deterministic(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~rate of rows, deterministically by id."""
    thr = _threshold(rate)  # validate before touching df
    return df.where(sample_key(F.col(id_col), salt) < F.lit(thr))


def dataset_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column (train/val/test...) by cumulative
    integer thresholds over the hash key. Weights must sum to 1;
    assignment is exhaustive and disjoint by construction."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = sample_key(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = key < F.lit(_threshold(cum))
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = (
        expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample dominant
    languages, keep all of rare ones) — the corpus-rebalancing
    primitive. Strata absent from ``rates`` get ``default_rate``."""
    key = sample_key(F.col(id_col), salt)
    thr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        t = F.lit(_threshold(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        thr.otherwise(F.lit(_threshold(default_rate)))
        if thr is not None
        else F.lit(_threshold(default_rate))
    )
    return df.where(key < thr)


def temperature_sample_rates(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    stratum_col: str = "lang",
) -> DataFrame:
    """Multilingual temperature-resampling rates: target distribution
    q_l ∝ n_l^alpha (the mT5/XLM-R recipe — alpha < 1 upweights rare
    languages), realized by per-stratum keep-rates under a total budget
    of ``budget_frac`` × corpus:

        rate_l = min(1, budget_frac · N · n_l^alpha / Σ_m n_m^alpha / n_l)

    One tiny groupBy (|strata| rows) + a cross join of two scalar
    aggregates — no corpus shuffle. Rates are floor-truncated to 1e-6
    (cross-engine float discipline); ``alpha=0.5`` routes through
    ``sqrt``, which IEEE requires to be correctly rounded on every
    engine — use it where oracle-grade reproducibility matters
    (generic ``pow`` may differ by 1 ulp between engines).
    """
    n = F.col("n_docs").cast("double")
    weight = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn("__w", weight)
    totals = counts.agg(
        F.sum("n_docs").alias("__N"), F.sum("__w").alias("__s")
    )
    raw = (
        F.lit(budget_frac)
        * F.col("__N").cast("double")
        * F.col("__w")
        / F.col("__s")
        / n
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        stratum_col,
        "n_docs",
        (F.floor(F.least(F.lit(1.0), raw) * 1e6) / 1e6).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Apply temperature-resampling: keep each row iff its md5 key
    clears its stratum's rate threshold. Plan: the |strata|-row rate
    table broadcasts into a narrow filter over the scan — the corpus
    is read once, never shuffled."""
    rates = temperature_sample_rates(df, alpha, budget_frac, stratum_col)
    thr = F.floor(F.col("rate") * F.lit(float(SAMPLE_SPACE))).cast("bigint")
    key = sample_key(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates.select(stratum_col, "rate")), stratum_col)
        .where(key < thr)
        .drop("rate")
    )


def shuffle_assign(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Seeded global corpus shuffle as (shard, pos) coordinates: every
    row gets a pseudorandom but fully deterministic position in one of
    ``n_shards`` output shards — the "shuffle the corpus before
    training" step, reproducible on any engine / partition layout
    (same md5 primitive as ``sample_key``; change ``salt`` for a fresh
    permutation).

    Plan: one narrow map computes (key, shard); one hash shuffle on
    shard; ``row_number`` per shard ordered by (key, id). There is no
    global sort and no single-task bottleneck — each shard's window
    sorts only its own ~N/n_shards rows, so at 100 TB you pick
    n_shards large enough that a shard's keys fit a task's sort
    budget (e.g. 10k shards ≈ 10 GB each) and the plan is exactly the
    write-side layout of a training-data shuffle job.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    key = sample_key(F.col(id_col), salt)
    keyed = df.select(
        F.col(id_col),
        key.alias("__key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def holdout_last_k(
    df: DataFrame,
    k: int = 5,
    entity: str = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Temporal train/eval split: each entity's LAST ``k`` rows (in
    stable time order) become the eval slice, everything earlier is
    train — the leakage-safe alternative to a random split for
    time-ordered corpora (a random split trains on the future of its
    own eval rows; this never does). Deterministic on any layout.

    Plan: one row_number over the REVERSED per-entity order (one
    shuffle + one sort); the split label is a narrow CASE. At 100 TB
    this is the same exchange every other per-entity window rides —
    schedule it in the same stage as the feature windows and the
    split is free.
    """
    rev = [F.col(c).desc() for c in order]
    w = Window.partitionBy(entity).orderBy(*rev)
    return df.withColumn(
        "split",
        F.when(F.row_number().over(w) <= k, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def group_kfold(
    df: DataFrame,
    k: int = 5,
    group: str = "user_id",
    salt: str = "kfold",
) -> DataFrame:
    """Grouped k-fold assignment: every row of a group lands in the
    SAME fold (fold = md5-key(group) mod k), so cross-validation never
    trains on one row of an entity while evaluating on another — the
    grouped analogue of ``dataset_split``'s leakage guarantee. The
    assignment is a pure function of the group id: stable across runs,
    engines, partition layouts, and as new rows arrive for an existing
    group (an id-range or row-number fold would reshuffle existing
    groups every time the corpus grows).

    Plan at 100 TB: a narrow map over the scan — NO shuffle, NO
    group-list materialization, no join; the md5 key is recomputed
    per-row, which is cheaper at scale than shipping a groups->fold
    table around.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    fold = F.pmod(sample_key(F.col(group), salt), F.lit(k))
    return df.withColumn("fold", fold.cast("int"))


def dataset_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted dataset mixing with fractional epochs — the LLM
    data-mixing step ("2.5 epochs of wiki, 0.3 of web"): each row of
    source s appears floor(w_s) times plus one more with probability
    frac(w_s), decided deterministically by md5 (the ``sample_key``
    primitive), so the mix is reproducible on any engine/layout and
    re-drawable per salt. Down-sampling (w<1) and epoch oversampling
    (w>1) fall out of the same rule; sources absent from ``weights``
    are dropped (explicit mix manifests only).

    Plan: pure NARROW work — a literal |sources|-row weight rule
    (CASE chain), an integer copy count, one explode. Zero shuffles,
    zero joins; output size is Σ w_s·|s| by construction. The copy
    index is part of the output key so downstream shuffle/packing
    treats epochs as distinct rows.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1000.0:
            # floor(w) full copies are EXPLODED per row — an absurd weight
            # is far more likely a units bug than a real 1000-epoch mix
            raise ValueError(
                f"weight for {s!r} must be in [0, 1000], got {w}"
            )
    base = F.lit(None).cast("int")
    frac_thr = F.lit(None).cast("bigint")
    for s, w in weights.items():
        whole, frac = int(w), w - int(w)
        base = F.when(F.col(source_col) == s, F.lit(whole)).otherwise(base)
        frac_thr = F.when(
            F.col(source_col) == s, F.lit(_threshold(frac))
        ).otherwise(frac_thr)
    key = sample_key(F.col(id_col), salt)
    n_copies = base + (key < frac_thr).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            n_copies.alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("copy_idx"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): keep the k rows with the largest u^(1/w), u a
    uniform draw — every row's inclusion probability is proportional
    to its weight among the survivors, the standard "sample documents
    ∝ length/quality" step rand() cannot do reproducibly.

    Determinism: u = (md5key+1)/2^32 (the sample_key primitive — an
    integer ratio, so ln(u) is correctly rounded on any libm, the
    _lm_score contract), score = ln(u)/w maximized ⇔ u^(1/w) maximized
    (strictly monotone for u∈(0,1], w>0), floor-quantized to integer
    micro-units with ties broken by id — any engine replays the exact
    sample. Weights must be positive integers (quantize at the call
    site); zero/negative-weight rows are EXCLUDED (they'd never win in
    the limit anyway; silently keeping them would bias the tail).

    Plan: pure narrow scoring map + TakeOrderedAndProject — zero
    shuffles, no global sort; the k-row heap merge is the reduction.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = sample_key(F.col(id_col), salt)
    u_num = key + F.lit(1)
    score = (
        F.floor(
            F.log(u_num.cast("double") / F.lit(float(SAMPLE_SPACE)))
            * F.lit(1e6)
            / F.col(weight_col).cast("double")
        )
        .cast("bigint")
        .alias("score_micro")
    )
    return (
        df.where(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), score)
        .orderBy(F.desc("score_micro"), F.col(id_col))
        .limit(k)
    )


def purged_folds(
    df: DataFrame,
    ts: str = "ts",
    id_col: str = "event_id",
    k: int = 5,
    embargo_seconds: float = 3600.0,
) -> DataFrame:
    """Purged time-series cross-validation (the leakage-safe CV for
    temporally-correlated data, de Prado's purged k-fold): the time
    range splits into k contiguous validation windows; for each fold a
    row is ``val`` inside the window, ``purged`` within the embargo
    margin on EITHER side (features built from rolling windows leak
    across a naive train/val boundary in both directions), else
    ``train``. Emits (id, fold, split) — k rows per input row.

    group_kfold shuffles ENTITIES across folds (iid assumption);
    temporal holdout cuts ONCE. This is the k-fold that respects time:
    every fold's train set excludes an embargo-widened band around its
    validation window, so a rolling feature computed at a train row can
    never have read a val row.

    Exactness: all boundary math in integer microseconds —
    ``lo_f = mn + span·f DIV k`` (multiply before divide, exact) — so
    fold membership is engine-identical. Plan: the (min, max) bounds
    are ONE lazy broadcast scalar; the fold fan-out is a narrow
    explode of a k-element sequence fused into the scan — ZERO
    shuffles at any corpus size.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    bounds = df.agg(
        F.min(us).alias("__mn"), F.max(us).alias("__mx")
    )
    emb_us = int(embargo_seconds * 1_000_000)
    folded = df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        us.alias("__us"),
        "__mn",
        "__mx",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("fold"),
    )
    lo = F.col("__mn") + F.expr(f"(__mx - __mn + 1) * fold DIV {k}")
    hi = F.col("__mn") + F.expr(f"(__mx - __mn + 1) * (fold + 1) DIV {k}")
    split = (
        F.when((F.col("__us") >= lo) & (F.col("__us") < hi), "val")
        .when(
            (F.col("__us") >= lo - emb_us) & (F.col("__us") < hi + emb_us),
            "purged",
        )
        .otherwise("train")
    )
    return folded.select(id_col, "fold", split.alias("split"))


def walk_forward_splits(
    df: DataFrame,
    ts: str = "ts",
    id_col: str = "event_id",
    k: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation report: the
    global time order splits into k EQUAL-COUNT contiguous folds; for
    each fold f, test = fold f, train = everything strictly earlier —
    the backtest protocol for time-ordered models. ``purged_folds``
    cuts by equal TIME span (folds can be wildly unequal in rows when
    traffic grows); this cuts by equal ROW count, which is what keeps
    per-fold training cost predictable on a growing corpus.

    Fold assignment is ``fold = idx·k DIV n`` over the CONTIGUOUS
    global index from :func:`~dane_visual_feature_extraction_worker_spark.operators.layout.global_index`
    ((ts, id) total order — one range exchange + a |partitions|-row
    driver prefix-sum, NO single-partition window at any scale), so
    membership is exact-integer and engine-replayable. Output is the
    k-row report (fold, n_test, n_train, ts_min, ts_max); n_train is
    the running sum of earlier fold sizes — a window over k rows.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from dane_visual_feature_extraction_worker_spark.operators.layout import global_index

    idx = global_index(
        df.select(F.col(id_col), F.col(ts).cast("timestamp").alias("__ts")),
        order_by=["__ts", id_col],
        idx_col="__idx",
        partitions=partitions,
    )
    n = idx.count()  # the persisted stamped frame — a cached scan
    if n == 0:
        raise ValueError("cannot split an empty frame")
    folds = idx.select(
        F.expr(f"CAST(__idx * {int(k)} DIV {int(n)} AS INT)").alias(
            "fold"
        ),
        "__ts",
    ).groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.min("__ts").alias("ts_min"),
        F.max("__ts").alias("ts_max"),
    )
    w = (
        Window.orderBy("fold")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # k-row frame: the single-partition window is |k|-sized, fine
    return folds.select(
        "fold",
        "n_test",
        F.coalesce(F.sum("n_test").over(w), F.lit(0))
        .cast("bigint")
        .alias("n_train"),
        "ts_min",
        "ts_max",
    )


def mixture_knapsack(
    stats: DataFrame,
    budget_tokens: int,
    source: str = "source",
    tokens: str = "n_tokens",
    score: str = "score_micro",
) -> DataFrame:
    """Greedy budgeted mixture plan: rank sources by score (desc,
    source asc tie-break), take whole sources until the token budget
    runs out, split the boundary source PARTIALLY, drop the rest —
    the planning step BEFORE ``dataset_mix`` executes a mix (this
    chooses the manifest; that applies it). Greedy-by-density is the
    optimal fractional-knapsack rule when sources are divisible,
    which token sampling makes them.

    Input is the PRE-AGGREGATED |sources|-row frame (build it from
    quality_score + a token rollup); the window here orders KB-sized
    rows, never the corpus — the one place a single-partition window
    is the right plan. All arithmetic exact integers;
    ``take_micro`` = taken·10⁶ DIV tokens per source.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    w = Window.orderBy(F.col(score).desc(), F.col(source))
    ranked = stats.select(
        F.col(source).alias("source"),
        F.col(tokens).cast("bigint").alias("n_tokens"),
        F.col(score).cast("bigint").alias("score_micro"),
    ).withColumn("rank", F.row_number().over(w).cast("bigint"))
    wcum = (
        Window.orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = ranked.withColumn(
        "__before", F.coalesce(F.sum("n_tokens").over(wcum), F.lit(0))
    ).select(
        "rank",
        "source",
        "n_tokens",
        "score_micro",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("n_tokens"),
                F.lit(int(budget_tokens)) - F.col("__before"),
            ),
        )
        .cast("bigint")
        .alias("take_tokens"),
    )
    return out.select(
        "rank",
        "source",
        "n_tokens",
        "score_micro",
        "take_tokens",
        F.when(F.col("take_tokens") == F.col("n_tokens"), F.lit("full"))
        .when(F.col("take_tokens") > 0, F.lit("partial"))
        .otherwise(F.lit("none"))
        .alias("status"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("take_tokens * 1000000 DIV n_tokens"),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("take_micro"),
    )

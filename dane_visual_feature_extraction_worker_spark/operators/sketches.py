"""Sketch-based approximate aggregation — the 100 TB profiling path.

Exact per-entity ``count_distinct`` keeps a set per group (a second
exchange level and O(|values|) state: user_event_profile documents the
exact plan); exact percentiles keep a value→count map
(quantile_bucketize documents the domain bound). Neither is the plan
you run FIRST over 10^12 rows. These operators are the sketch twins:
HyperLogLog++ distinct counts and t-digest-style quantiles — fixed
O(kB) state per group, single-pass, mergeable (map-side combined), the
standard first-look profile over a corpus too large to count exactly.

Results are approximate by construction, so these keys carry NO SQL
oracle (DuckDB's sketches use different internals); the correctness
contract is the tolerance test in tests/test_sketches.py — each
estimate within the sketch's published error bound of the exact
answer computed on the same (small) input — plus the rows-only gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def approx_profile(
    df: DataFrame,
    entity: str = "user_id",
    distinct_col: str = "event_type",
    value: str = "value",
    rsd: float = 0.02,
    pctl_accuracy: int = 1000,
) -> DataFrame:
    """Per-entity sketch profile: HLL++ approximate distinct count of
    ``distinct_col`` (relative standard deviation ``rsd``) and
    approximate p50/p95 of ``value`` (Greenwald-Khanna with
    1/``pctl_accuracy`` rank error), plus the exact row count that
    comes free with the same pass.

    ONE map-side-combined aggregate: sketch state is a few KB per
    (task, entity) regardless of corpus size — the shuffle carries
    merged sketches, never values. This is the plan that profiles
    10^12 rows in one pass; the exact twins (user_event_profile,
    grouped_quantiles) are for when the answer must be exact and the
    domain is known to be bounded.
    """
    return df.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("n_distinct_est"),
        F.percentile_approx(value, 0.5, pctl_accuracy).alias("p50_est"),
        F.percentile_approx(value, 0.95, pctl_accuracy).alias("p95_est"),
    )


# ---------------------------------------------------------------------------
# Deterministic sketch twins — md5-keyed, so (unlike HLL++/GK above) every
# estimate is a pure integer function of the input that ANY engine replays
# bit-for-bit: these keys DO carry full SQL oracles.
# ---------------------------------------------------------------------------


def kmv_distinct(
    df: DataFrame,
    group: str = "event_type",
    value: str = "user_id",
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct sketch per group →
    ``(group, n_kept, kmv_estimate)``: keep the k smallest 32-bit md5
    hashes of ``value`` per group; if fewer than k distinct hashes
    exist the count is exact, else the classic KMV estimator
    ``(k-1) * 2^32 / h_k`` (h_k = k-th smallest hash), floor-truncated
    — all integer-exact operands, so the estimate is deterministic and
    SQL-replayable, unlike HLL whose register layout is
    engine-internal.

    Plan: distinct on (group, hash) is the one wide pass (map-side
    combined — the shuffle carries distinct pairs, never rows); the
    per-group k-smallest is a window over the already-distinct frame.
    At 10^12 rows the right production variant keeps a k-heap per
    partial aggregate (constant state, like HLL); this formulation
    trades that for exactness-of-the-sketch under the oracle gate and
    still never materializes a per-group value set wider than the
    distinct-pair frame.  32-bit hash collisions fold distinct values
    together by construction — that IS the sketch's semantics, and the
    oracle replays it identically.
    """
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        SAMPLE_SPACE,
        sample_key,
    )
    from pyspark.sql import Window

    d = df.select(
        F.col(group), sample_key(F.col(value), salt=salt).alias("__h")
    ).distinct()
    w = Window.partitionBy(group).orderBy("__h")
    kept = d.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    agg = kept.groupBy(group).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("__h").cast("bigint").alias("__hk"),
    )
    est = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .when(F.col("__hk") <= 0, F.col("n_kept"))
        .otherwise(
            F.floor(
                (F.lit(k - 1) * F.lit(SAMPLE_SPACE)).cast("double")
                / F.col("__hk").cast("double")
            ).cast("bigint")
        )
    )
    return agg.select(group, "n_kept", est.alias("kmv_estimate"))


def cms_estimates(
    tokens: DataFrame,
    probe_terms: list[str],
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch over a token stream, probed at ``probe_terms``
    → ``(term, exact_count, cms_estimate)`` with estimate >= exact by
    construction (hash-bucket collisions only ever ADD).  Row-i bucket
    is ``md5(salt|i#term) mod width`` — deterministic, so the whole
    d x w sketch and every probe estimate replay bit-for-bit in SQL.

    Plan: the sketch build is ONE map-side-combined aggregate — each
    task folds its token stream into its own d x w cell grid before the
    exchange, so the shuffle carries at most tasks x d x w cells
    regardless of corpus size (the explode-by-depth multiplies rows
    only inside the partial aggregate).  Probes are |terms| x d rows
    joined against the broadcast 4096-cell sketch; exact counts prune
    the token stream to the probe set BEFORE their shuffle (the bm25
    postings discipline).  This is the frequency oracle you consult at
    100 TB when exact per-term counts are a luxury: O(d*w) state,
    mergeable across shards/days by cell-wise addition.
    """
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        sample_key,
    )

    if not probe_terms:
        raise ValueError("probe_terms must be non-empty")
    rows = F.array(*[F.lit(i) for i in range(depth)])
    bucket = lambda r, t: F.pmod(  # noqa: E731
        sample_key(F.concat_ws("#", r.cast("string"), t), salt=salt),
        F.lit(width),
    )
    e = tokens.select(F.col(term_col), F.explode(rows).alias("__row"))
    sketch = (
        e.groupBy(
            "__row", bucket(F.col("__row"), F.col(term_col)).alias("__bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    spark = tokens.sparkSession
    probes = spark.createDataFrame(
        [(t,) for t in probe_terms], f"{term_col} string"
    ).select(term_col, F.explode(rows).alias("__row"))
    probes = probes.withColumn(
        "__bucket", bucket(F.col("__row"), F.col(term_col))
    )
    est = (
        probes.join(F.broadcast(sketch), ["__row", "__bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("__cnt", F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        tokens.where(F.col(term_col).isin(probe_terms))
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    return est.join(exact, term_col, "left").select(
        term_col,
        F.coalesce("exact_count", F.lit(0).cast("bigint")).alias("exact_count"),
        "cms_estimate",
    )


def bloom_export(
    df: DataFrame,
    key: F.Column,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Portable Bloom filter AS DATA: the cross-system membership
    interchange sketch — ship these 32 rows to another pipeline and it
    can pre-filter candidate joins against your key set without ever
    seeing the keys (Spark's own bloom_filter_agg is opaque binary;
    this layout any engine can build, merge and probe).

    Layout: ``m_bits`` bits in 32-bit words stored in int64 (bit 31 is
    the highest used — avoids the signed <<63 overflow DuckDB rejects
    and Spark silently wraps); ``k`` bit positions per key from
    DISJOINT 8-hex slices of md5(key) (the hashed_cross fold — engine-
    neutral). Merge of two exports = bit_or by word; probe = all k
    words AND-match.

    Plan: narrow k-position explode → ONE map-side-combined bit_or per
    word — the exchange carries ≤ 32·tasks partial words, never keys.
    Output: (word, bits, n_keys) — n_keys rides the same rollup for
    saturation/FPR accounting (fpr ≈ (1 − e^{−kn/m})^k).
    """
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    if not 1 <= k <= 3:
        raise ValueError(f"k must be 1..3 (md5 has 3 disjoint 8-hex slices + 8 spare), got {k}")
    hx = F.md5(key.cast("string"))
    pos = [
        F.conv(F.substring(hx, 1 + 8 * j, 8), 16, 10).cast("bigint")
        % F.lit(m_bits)
        for j in range(k)
    ]
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    exploded = df.select(
        F.explode(F.array(*pos)).alias("__p")
    ).select(
        F.expr("__p div 32").cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))").alias(
            "__b"
        ),
    )
    words = exploded.groupBy("word").agg(F.bit_or("__b").alias("bits"))
    return words.crossJoin(F.broadcast(n)).select("word", "bits", "n_keys")


def hll_distinct(
    df: DataFrame,
    group: str = "event_type",
    value: str = "user_id",
    salt: str = "hll",
) -> DataFrame:
    """Deterministic HyperLogLog (m=256 registers) per group →
    ``(group, n_exact, n_registers, s_scaled, hll_estimate)``: the
    md5-keyed twin of Spark's engine-internal HLL++
    (``approx_profile``), with every register value a pure integer
    function of the input — any SQL engine replays the whole sketch
    AND the estimate bit-for-bit.

    Register math: the 32-bit md5 key splits into an 8-bit register
    index and a 24-bit suffix ``w``; the register records
    ``rho = 25 - bit_length(w)`` (the classic leading-zeros-plus-one,
    via ``length(bin(w))`` — exact integers, no log). The harmonic
    denominator is kept SCALED-INTEGER: ``s_scaled = Σ_j 2^(25 - M_j)``
    over all 256 registers (empty register → ``2^25``), max
    ``256·2^25 = 2^33`` — int64-exact, order-independent. The only
    float ops are the ONE final division ``ALPHA_CONST / s_scaled``
    and the small-range linear-counting branch, which uses the repo's
    floor-scaled integer micro-nat ln (the PSI/LM discipline) so both
    engines floor the same integer before any float appears.

    Plan: ONE map-side-combined aggregate per level —
    (group, register) → max(rho), then group → sum; the shuffle
    carries at most ``tasks × |groups| × 256`` register rows
    regardless of corpus size. The exact-distinct column is the
    calibration twin (same pattern as ann_recall_report /
    pq_recall_report) and is the only corpus-distinct pass; drop it
    at 10^12 rows and the sketch is O(256) state per group.
    """
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        sample_key,
    )

    m = 256
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha * m^2 * 2^25 — one double literal shared with the oracle.
    const = alpha * m * m * float(1 << 25)
    key = sample_key(F.col(value), salt=salt)
    w = F.floor(key / F.lit(m)).cast("bigint")
    rho = F.lit(25) - F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.bin(w))
    ).cast("int")
    regs = (
        df.select(F.col(group), F.pmod(key, F.lit(m)).alias("__reg"), rho.alias("__rho"))
        .groupBy(group, "__reg")
        .agg(F.max("__rho").alias("__m"))
    )
    s = regs.groupBy(group).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        F.sum(
            # pyspark's F.shiftleft only takes a literal shift; the SQL
            # form accepts a column expression.
            F.expr("shiftleft(CAST(1 AS BIGINT), 25 - __m)")
        ).cast("bigint").alias("__sp"),
    )
    s_scaled = (
        F.col("__sp")
        + (F.lit(m).cast("bigint") - F.col("n_registers")) * F.lit(1 << 25)
    )
    raw = F.lit(const) / s_scaled.cast("double")
    v_empty = F.lit(m).cast("bigint") - F.col("n_registers")
    # linear counting: m * ln(m / V) with both lns floor-scaled to
    # integer micro-nats (ln(256)·1e6 pre-floored as a literal).
    ln_m_micro = 5545177  # floor(ln(256) * 1e6)
    lc_micro = F.lit(m).cast("bigint") * (
        F.lit(ln_m_micro)
        - F.floor(F.log(v_empty.cast("double")) * 1e6).cast("bigint")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        lc_micro.cast("double") / F.lit(1e6),
    ).otherwise(raw)
    sketch = s.select(
        group,
        "n_registers",
        s_scaled.alias("s_scaled"),
        est.alias("hll_estimate"),
    )
    exact = df.groupBy(group).agg(
        F.countDistinct(value).cast("bigint").alias("n_exact")
    )
    return sketch.join(exact, group).select(
        group, "n_exact", "n_registers", "s_scaled", "hll_estimate"
    )


def logbucket_quantiles(
    df: DataFrame,
    group: str = "event_type",
    value: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """DDSketch-style relative-error quantile estimates (γ=2: power-of-
    two buckets) per group → one row per (group, q) with the covering
    bucket's exact integer bounds. Bucket index for integer cents ≥ 1
    is ``bit_length(cents)`` (``length(bin(x))`` — exact, no float
    log); cents = 0 lands in bucket 0; negatives are clamped to bucket
    0 with the count reported so the caller sees them. The q-quantile
    estimate is the smallest bucket whose cumulative count reaches
    ``ceil(q·n)`` — guaranteed within a factor of 2 of the true value
    (γ=2 relative error), every output column integer-exact.

    Plan: ONE map-side-combined groupBy(group, bucket) — at most ~64
    buckets per group cross the exchange regardless of corpus size —
    then a window over the ≤64-row per-group histogram. This is the
    quantile profile you run FIRST at 10^12 rows; grouped_quantiles /
    quantile_bucketize are the exact twins when the value domain is
    known to be bounded.
    """
    from pyspark.sql import Window

    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    bucket = F.when(cents <= 0, F.lit(0)).otherwise(
        F.length(F.bin(cents)).cast("int")
    )
    hist = (
        df.where(F.col(value).isNotNull())
        .select(F.col(group), bucket.alias("__b"))
        .groupBy(group, "__b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    w = Window.partitionBy(group).orderBy("__b")
    cum = hist.select(
        group,
        "__b",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(
            Window.partitionBy(group).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    # micro-scaled q as PYTHON-side integer literals: double→int CASTs
    # diverge across engines (Spark truncates, DuckDB rounds), so the
    # only q the plan ever sees is the pre-rounded integer.
    q_micro = [(float(q), int(round(q * 1e6))) for q in quantiles]
    qs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(qf).alias("q"), F.lit(qm).cast("bigint").alias("qm")
                )
                for qf, qm in q_micro
            ]
        )
    ).alias("__q")
    probes = cum.select(
        group, "__b", "__cum", "__n", qs
    ).select(
        group, "__b", "__cum", "__n",
        F.col("__q.q").alias("q"), F.col("__q.qm").alias("__qm"),
    )
    # rank = ceil(q·n) = (qm·n + 999999) div 1e6 — int64-exact
    # (qm·n ≤ 1e6·1e12 = 1e18 < 2^63; float division would lose
    # integer precision past 2^53).
    rank = F.expr("(__qm * __n + 999999) div 1000000")
    hit = probes.where(F.col("__cum") >= rank)
    out = hit.groupBy(group, "q").agg(
        F.min("__b").alias("bucket"),
        F.max("__n").alias("n"),
    )
    lo = F.when(
        F.col("bucket") <= 0, F.lit(0).cast("bigint")
    ).otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)"))
    hi = F.when(
        F.col("bucket") <= 0, F.lit(0).cast("bigint")
    ).otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1)
    return out.select(
        group,
        "q",
        "n",
        "bucket",
        lo.alias("lo_cents"),
        hi.alias("hi_cents"),
    )


def kmv_overlap(
    df: DataFrame,
    value: str,
    in_a: F.Column,
    in_b: F.Column,
    k: int = 256,
    salt: str = "kmvj",
) -> DataFrame:
    """KMV set-OVERLAP sketch between two predicate-defined sets over
    one column: per-set distinct estimates, the union estimate, the
    KMV Jaccard (share of common elements among the k smallest UNION
    hashes — the classic bottom-k coordinated-sample estimator) and
    the derived intersection estimate.  The question audiences ask of
    two sources ("how much do their user bases overlap?") at sketch
    cost: exact distinct-intersection needs a shuffle of BOTH full
    key sets; this reads k rows three times.

    Same determinism contract as ``kmv_distinct``: 32-bit md5 hashes,
    all-integer estimates ((k−1)·2³² DIV h_k; exact counts below k),
    jaccard_micro = common·10⁶ DIV n_union_kept — SQL-replayable, no
    engine-internal register layout.

    Plan: ONE distinct-hash exchange builds (hash, in_a, in_b)
    membership flags (max-combined map-side); the three k-smallest
    reads are TakeOrderedAndProject passes over that persisted frame —
    per-partition top-k then a k·p driver merge, never an
    unpartitioned window sort.  Output is one row.
    """
    from dane_visual_feature_extraction_worker_spark.functions.cacheutil import (
        scoped_persist,
    )
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        SAMPLE_SPACE,
        sample_key,
    )

    base = df.select(
        sample_key(F.col(value), salt=salt).alias("__h"),
        in_a.cast("int").alias("__a"),
        in_b.cast("int").alias("__b"),
    ).where((F.col("__a") == 1) | (F.col("__b") == 1))
    hk = scoped_persist(
        base.groupBy("__h").agg(
            F.max("__a").alias("__a"), F.max("__b").alias("__b")
        ),
        "sketches.kmv_overlap",
    )

    def _est(n_col: str, hk_col: str) -> F.Column:
        return (
            F.when(F.col(n_col) < k, F.col(n_col))
            .when(F.col(hk_col) <= 0, F.col(n_col))
            .otherwise(
                F.floor(
                    (F.lit(k - 1) * F.lit(SAMPLE_SPACE)).cast("double")
                    / F.col(hk_col).cast("double")
                ).cast("bigint")
            )
        )

    def _topk(frame: DataFrame, tag: str) -> DataFrame:
        return (
            frame.orderBy("__h")
            .limit(k)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(f"__n_{tag}"),
                F.max("__h").cast("bigint").alias(f"__hk_{tag}"),
                F.sum(
                    F.when((F.col("__a") == 1) & (F.col("__b") == 1), 1)
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"__c_{tag}"),
            )
        )

    u = _topk(hk, "u")
    a = _topk(hk.where(F.col("__a") == 1), "a")
    b = _topk(hk.where(F.col("__b") == 1), "b")
    out = u.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b)).select(
        F.col("__n_a").alias("n_kept_a"),
        _est("__n_a", "__hk_a").alias("est_a"),
        F.col("__n_b").alias("n_kept_b"),
        _est("__n_b", "__hk_b").alias("est_b"),
        F.col("__n_u").alias("n_kept_union"),
        _est("__n_u", "__hk_u").alias("est_union"),
        F.when(
            F.col("__n_u") > 0,
            F.expr("__c_u * 1000000 DIV __n_u"),
        )
        .cast("bigint")
        .alias("jaccard_micro"),
        F.col("__c_u").alias("n_common_in_k"),
    )
    return out.withColumn(
        "est_intersection",
        F.expr("jaccard_micro * est_union DIV 1000000").cast("bigint"),
    )

"""Feature-encoding operators: leakage-free target encoding, the
hashing-trick feature cross, and global standardization.

These are the last-mile transforms a training-data pipeline applies
after the PIT joins: turn categories into numbers WITHOUT reading the
future (the north rule's zero-temporal-leakage discipline — the same
at-or-before-anchor frame the window kernel uses), cross high-cardinality
categories into a bounded hash space, and z-normalize (the reference's
own (x - mean)/std transform, misc/spectrogram_example2/
get_sepectogram.py:63-64, lifted from per-tensor constants to
corpus-level statistics).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def target_encode_pit(
    df: DataFrame,
    category: str = "event_type",
    target: str = "value",
    order: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Leakage-free target encoding: each row's encoding is the mean of
    ``target`` over STRICTLY EARLIER rows of the same category
    (frame ends at -1 — the current row's own target never leaks into
    its own feature, and nothing after the anchor is readable). Rows
    with no history get NULL (first occurrence of a category) — the
    caller picks the prior (global mean, sentinel, ...) explicitly.

    Cross-engine exactness: the running numerator is integer cents
    (``decimal(18,2) * 100``) and the count an int — the mean is ONE
    IEEE divide of two exact ints, bit-identical on any engine.

    Plan: one window (one shuffle + sort on the category). Skew note
    for 100 TB: the partition key is the CATEGORY, whose domain is
    usually tiny — a hot category serializes into one task exactly
    like a hot conversation, so at scale route categories above the
    task budget through the salted block decomposition
    (operators/windows.salted_prefix_features machinery; the
    prefix-sum regrouping applies to this running sum unchanged).
    """
    w = (
        Window.partitionBy(category)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = (F.col(target).cast("decimal(18,2)") * 100).cast("bigint")
    n_prior = F.count(cents).over(w)
    sum_prior = F.sum(cents).over(w)
    return df.select(
        *order,
        category,
        F.when(
            n_prior > 0, (sum_prior / n_prior) / F.lit(100.0)
        ).alias("target_enc"),
        n_prior.cast("bigint").alias("n_prior"),
    )


def hashed_cross(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 1 << 10,
    out: str = "cross_bucket",
) -> DataFrame:
    """Hashing-trick feature cross: the tuple of ``cols`` is rendered
    injectively ('|' separated, NULL as the empty rendering), md5'd,
    and folded into ``n_buckets`` buckets — unbounded cross-product
    domains become a fixed-width feature space with no vocabulary
    build, no shuffle, and a layout-independent bucket id any engine
    can replay (md5 is engine-neutral; the fold uses the first 8 hex
    digits as an int).

    Plan: pure narrow projection fused into the scan — zero
    exchanges, whole-stage codegen.
    """
    rendered = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    bucket = (
        F.conv(F.substring(F.md5(rendered), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )
    return df.withColumn(out, bucket)


def standardize(
    df: DataFrame,
    value: str = "value",
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Global z-normalization (x - mean) / std over the corpus — the
    reference's z-norm (get_sepectogram.py:63-64) with corpus-level
    statistics. Two-pass: ONE tiny map-side-combined aggregate (three
    numbers: n, sum, sum-of-squares in exact decimal over integer
    cents), broadcast to a narrow map — no second shuffle, the big
    side never moves.

    Parity: the sums are EXACT decimals; casting an exact decimal to
    double is correctly rounded (deterministic, engine-identical), so
    mean/var/std/z are identical IEEE op chains on both engines; the
    emitted z is floor-truncated to 6 decimals. Accuracy note for
    10^12 rows: the sum-of-squares difference formula loses digits
    once n·E[x²] approaches 2^53 after the double cast — swap in a
    per-partition Welford merge (mapInPandas + tree-reduce) if the
    corpus's value magnitudes demand it; the two-pass shape stays.
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    stats = df.select(cents.alias("__c")).agg(
        F.count("__c").alias("__n"),
        F.sum(F.col("__c").cast("decimal(38,0)")).cast("double").alias("__s"),
        F.sum((F.col("__c") * F.col("__c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("__ss"),
    )
    j = df.join(F.broadcast(stats))
    mean = F.col("__s") / F.col("__n")
    var = (F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__n")) / (
        F.col("__n") - 1
    )
    z = (cents - mean) / F.sqrt(var)
    return j.select(
        *keys,
        (F.floor(z * F.lit(1_000_000.0)) / F.lit(1_000_000.0)).alias("z_value"),
    )


def quantile_bucketize(
    df: DataFrame,
    value: str = "value",
    n_buckets: int = 10,
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Global quantile binning (decile features): bucket k holds rows
    between the k/n and (k+1)/n corpus quantiles. Two-pass — ONE tiny
    exact `percentile` aggregate over integer cents (n-1 numbers)
    broadcast into a narrow comparison map; the corpus never shuffles
    and there is NO global sort (the naive ntile-over-everything plan
    is one task at 100 TB; this is O(corpus) map work).

    Parity: DISCRETE quantiles (inverse ECDF — the smallest value with
    cumulative distribution >= q), so every threshold is an ACTUAL
    integer cent, never an interpolation: interpolated quantiles of
    tied values can round 1 ULP apart between engines and flip a
    boundary row's bucket; discrete ones cannot. The bucket id is then
    a sum of pure integer comparisons — engine-exact end to end.

    Aggregation-state footprint at 10^12 rows: Spark's percentile
    aggregates keep an (value → count) map, so partial state is
    O(|distinct cents|), NOT O(rows) — bounded by the value domain
    (money in cents ⇒ millions of entries at most), and the one merge
    reducer holds a single such map. For a genuinely unbounded-domain
    column, swap the exact pass for a fixed-width integer histogram
    (two passes, same broadcast shape) before trusting this plan.
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    qs = [k / n_buckets for k in range(1, n_buckets)]
    stats = df.select(cents.alias("__c")).agg(
        *[
            F.expr(
                f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY __c)"
            ).alias(f"__q{k}")
            for k, q in enumerate(qs, 1)
        ]
    )
    j = df.join(F.broadcast(stats))
    bucket = F.lit(0)
    for k in range(1, n_buckets):
        bucket = bucket + (cents > F.col(f"__q{k}")).cast("int")
    return j.select(*keys, bucket.cast("int").alias("bucket"))


def freq_encode(
    df: DataFrame,
    category: str = "event_type",
    min_count: int = 0,
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Frequency (count) encoding with rare-category collapse: each row
    gets its category's corpus count and share; categories below
    ``min_count`` collapse into the '__other__' bucket (the standard
    guard against high-cardinality tails memorizing single rows).

    Plan: one map-side-combined count per category (|domain| rows —
    always broadcastable) + a broadcast join back; the corpus never
    shuffles. The share is one IEEE divide of two exact ints.
    """
    counts = df.groupBy(category).agg(F.count(F.lit(1)).alias("__cnt"))
    total = df.count()
    j = df.join(F.broadcast(counts), on=category)
    cat_out = F.when(
        F.col("__cnt") >= min_count, F.col(category).cast("string")
    ).otherwise(F.lit("__other__"))
    return j.select(
        *keys,
        cat_out.alias("category"),
        F.col("__cnt").alias("cat_count"),
        (F.col("__cnt") / F.lit(float(total))).alias("cat_share"),
    )


def winsorize(
    df: DataFrame,
    value: str = "value",
    lower: float = 0.01,
    upper: float = 0.99,
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Winsorization: clip the value at the global [lower, upper]
    corpus quantiles — the standard robust-preprocessing step before
    standardization (a single fat-finger outlier otherwise owns the
    variance). Same two-pass shape as quantile_bucketize: one tiny
    exact-percentile aggregate over integer cents, broadcast into a
    narrow clamp; no corpus shuffle, no global sort.

    Parity: DISCRETE quantiles (inverse ECDF — actual integer cents,
    never an interpolation that can round 1 ULP apart between
    engines); the clamp is integer min/max; the final /100 is one
    IEEE divide. Aggregation state is O(|distinct cents|), not
    O(rows) — see quantile_bucketize for the domain-bound caveat.
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    stats = df.select(cents.alias("__c")).agg(
        F.expr(
            f"percentile_disc({lower!r}) WITHIN GROUP (ORDER BY __c)"
        ).alias("__lo"),
        F.expr(
            f"percentile_disc({upper!r}) WITHIN GROUP (ORDER BY __c)"
        ).alias("__hi"),
    )
    j = df.join(F.broadcast(stats))
    clipped = F.least(F.greatest(cents, F.col("__lo")), F.col("__hi"))
    return j.select(
        *keys,
        (clipped / F.lit(100.0)).alias("value_winsor"),
    )


def grouped_quantiles(
    df: DataFrame,
    group: str = "event_type",
    value: str = "value",
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-group exact quantiles (p25/p50/p75/p90 by default) — the
    grouped distribution profile behind per-category monitoring and
    per-stratum normalization. DISCRETE quantiles over integer cents
    (inverse ECDF: smallest value with cumulative distribution >= q),
    same parity rationale as quantile_bucketize: every output is an
    ACTUAL data value, so no interpolation can round differently
    between engines.

    Plan at 100 TB: ONE hash shuffle on the group key into a sort-based
    percentile aggregate — |groups| output rows, no window, no
    per-group explode. (percentile_disc is not map-side partial —
    Spark ships group-local sorted runs — so for very-low-cardinality
    groups over 10^12 rows prefer the two-pass histogram form; at
    typical group counts the single exchange is the right plan.)
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    aggs = [
        (
            F.expr(
                f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY __c)"
            ).cast("double")
            / 100.0
        ).alias(f"p{int(q * 100)}")
        for q in qs
    ]
    return (
        df.select(F.col(group), cents.alias("__c"))
        .groupBy(group)
        .agg(*aggs)
    )


def robust_outliers(
    df: DataFrame,
    value: str = "value",
    k: int = 3,
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Median/MAD outlier flag: a row is an outlier when
    |x - median| > k * MAD (MAD = median absolute deviation) — the
    robust twin of the z-score cut ``standardize`` enables: one
    fat-finger value moves a mean/std gate arbitrarily, but moves the
    median/MAD gate not at all (50% breakdown point).

    Three passes, each a TINY aggregate broadcast back — the corpus
    never shuffles: (1) discrete median of integer cents (inverse
    ECDF — an actual data value, the quantile_bucketize parity
    rationale); (2) discrete median of |x - med| (again exact ints);
    (3) a narrow integer comparison map. ``k`` is an INTEGER multiplier
    so the flag is pure int64 arithmetic — bit-identical on any
    engine, no float anywhere until the reported deviation.

    Aggregation state is O(|distinct cents|) per pass (domain-bound
    caveat: see quantile_bucketize). Returns (keys..., deviation,
    is_outlier) with deviation = (x - median)/100 as double (one IEEE
    divide of exact ints).
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    med = df.select(cents.alias("__c")).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __c)").alias(
            "__med"
        )
    )
    dev = df.join(F.broadcast(med)).select(
        F.abs(cents - F.col("__med")).alias("__d")
    )
    mad = dev.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __d)").alias(
            "__mad"
        )
    )
    j = df.join(F.broadcast(med)).join(F.broadcast(mad))
    return j.select(
        *keys,
        ((cents - F.col("__med")) / F.lit(100.0)).alias("deviation"),
        (F.abs(cents - F.col("__med")) > F.lit(k) * F.col("__mad")).alias(
            "is_outlier"
        ),
    )


def quantile_normalize(
    df: DataFrame,
    value: str = "value",
    keys: Sequence[str] = ("event_id",),
) -> DataFrame:
    """ECDF transform: map every value to its exact empirical quantile
    rank P(X <= x) — rank-order normalization that makes any two
    features comparable regardless of their marginal distributions
    (the continuous generalization of quantile_bucketize's 10 bins).

    The naive plan — cume_dist() over a global ORDER BY — is ONE task
    at 100 TB. Instead: one map-side-combined count per DISTINCT cent,
    a running sum over the distinct-value frame (domain-bound: the
    same O(|distinct cents|) state quantile_bucketize documents — for
    an unbounded domain substitute the fixed-width histogram), and a
    join back on the cent. ecdf = cum/n is one IEEE divide of exact
    ints, identical to cume_dist by definition (count of rows <= x
    over n), which is exactly what the oracle replays. The ECDF table
    is BROADCAST back (domain-bound), so the corpus never shuffles —
    for a domain too large to broadcast, drop the hint and the join
    shuffles on the cent key (uniform by construction: each key is
    one distinct value).
    """
    cents = (F.col(value).cast("decimal(18,2)") * 100).cast("bigint")
    counts = df.select(cents.alias("__c")).groupBy("__c").agg(
        F.count(F.lit(1)).alias("__k")
    )
    w = Window.orderBy("__c").rowsBetween(Window.unboundedPreceding, 0)
    # n = total of the per-cent counts — same frame, no second corpus
    # scan and no eager action at plan-construction time
    w_all = Window.orderBy("__c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ecdf = counts.select(
        "__c",
        (
            F.sum("__k").over(w).cast("double")
            / F.sum("__k").over(w_all).cast("double")
        ).alias("ecdf"),
    )
    return (
        df.select(*keys, cents.alias("__c"))
        .join(F.broadcast(ecdf), "__c")
        .select(*keys, "ecdf")
    )


def hashed_bow(
    docs: DataFrame,
    tokens_col,
    id_col: str = "doc_id",
    n_buckets: int = 1 << 8,
) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al. ICML'09 feature
    hashing): every token folds into one of ``n_buckets`` signed
    buckets — ``φ[b] = Σ_{t: h(t)=b} ξ(t)·tf(t)`` — giving a
    fixed-width sparse text feature vector with NO vocabulary build
    (the unbounded-vocab companion to ``hashed_cross``, which hashes
    one tuple per row; this hashes every token of every document).
    The sign hash ξ ∈ {±1} makes collisions cancel in expectation —
    the property that keeps hashed features unbiased.

    Exactness: bucket = first-8-hex-digits of md5(token) mod
    n_buckets (the hashed_cross idiom — md5 is engine-neutral); sign
    = +1 iff the 9th hex digit is in 0-7 (one md5 bit, independent of
    the bucket bits); values are exact int64 signed counts.

    Plan: tokenize → explode → narrow bucket/sign projection → ONE
    map-side-combined (id, bucket) aggregate — token occurrences
    combine to ≤ n_buckets rows per document BEFORE the exchange, so
    the shuffle carries O(docs·buckets), never the token stream.
    Output: (id, bucket, v) sparse triplets — the layout a trainer's
    sparse-matrix loader reads directly.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col).alias("__t"))
    hx = F.md5(F.col("__t"))
    bucket = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint") % F.lit(n_buckets)
    )
    sign = F.when(
        F.substring(hx, 9, 1).isin(*list("01234567")), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("__s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("__s").cast("bigint").alias("v"))
    )


def rare_collapse(
    df: DataFrame,
    category: str,
    min_count: int = 100,
    other: str = "__other__",
) -> DataFrame:
    """Tail-category collapse report: categories seen fewer than
    ``min_count`` times fold into ``other`` — the standard
    cardinality-control step before one-hot/frequency/WOE encoding (a
    10⁷-level id column would otherwise explode the encoder) and a
    privacy smoother (rare levels are quasi-identifiers; see
    k_anonymity).

    Output, one row per SURVIVING level: ``(category_out, n_rows,
    n_levels_merged)`` — the ``other`` row carries how many raw levels
    it absorbed. Plan: ONE map-side-combined count per raw level, then
    the |levels|-row frame re-groups after the fold — the corpus is
    read once and never shuffled (both exchanges are level-sized).
    Deterministic: no ordering dependence anywhere.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    counts = df.groupBy(F.col(category).alias("__c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    folded = counts.select(
        F.when(F.col("__n") >= min_count, F.col("__c"))
        .otherwise(F.lit(other))
        .alias("category_out"),
        "__n",
    )
    return folded.groupBy("category_out").agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_levels_merged"),
    )


def hashing_collisions(
    docs: DataFrame,
    tokens_col,
    n_buckets: int = 1 << 8,
) -> DataFrame:
    """Collision audit for the ``hashed_bow`` feature hasher at a
    candidate dimension: how many distinct terms share buckets, and —
    the number that actually hurts — the TOKEN-MASS share sitting in
    collided buckets (a hot term colliding with a hot term biases the
    feature far more than two hapax terms sharing a slot). Run this
    over candidate ``n_buckets`` before fixing the feature width.

    Same bucket function as hashed_bow (first-8-hex md5 mod dim —
    engine-neutral), so the audit prices EXACTLY the hasher that will
    run. One row out: ``(n_buckets, n_terms, buckets_used,
    collided_terms, mass_total, mass_collided, mass_collided_micro)``.

    Plan: vocab frame (one map-side-combined term count), bucket
    projection, ONE bucket rollup + scalar aggregate — vocab-sized
    exchanges only.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    terms = (
        docs.select(F.explode(tokens_col).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % F.lit(n_buckets)
    )
    per_bucket = terms.select(
        bucket.alias("__b"), F.col("__c")
    ).groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
        F.sum("__c").cast("bigint").alias("__mass"),
    )
    return per_bucket.agg(
        F.lit(int(n_buckets)).cast("bigint").alias("n_buckets"),
        F.sum("__nt").cast("bigint").alias("n_terms"),
        F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
        F.sum(
            F.when(F.col("__nt") >= 2, F.col("__nt")).otherwise(0)
        )
        .cast("bigint")
        .alias("collided_terms"),
        F.sum("__mass").cast("bigint").alias("mass_total"),
        F.sum(
            F.when(F.col("__nt") >= 2, F.col("__mass")).otherwise(0)
        )
        .cast("bigint")
        .alias("mass_collided"),
    ).select(
        "*",
        F.expr("mass_collided * 1000000 DIV mass_total")
        .cast("bigint")
        .alias("mass_collided_micro"),
    )


def partition_balance(
    df: DataFrame,
    key_col: str,
    n_partitions: tuple[int, ...] = (32, 256),
) -> DataFrame:
    """Partition-balance audit for an md5-keyed layout: for each
    candidate partition count P, the max/mean bucket load the scheme
    would produce — the pre-flight check before ``repartition(P,
    key)`` / bucketed writes at 100 TB (a 3× max/mean means the
    biggest task runs 3× the average: straggler city). Uses the
    engine-portable md5 bucket (NOT Spark's Murmur3, which no oracle
    can replay — same trade as hashed_bow, and a fine proxy: both
    are uniform on realistic keys).

    Plan: ONE map-side-combined key count (corpus pruned to the key),
    then per P a bucket rollup of the key frame — |keys|·|Ps|
    intermediate, |Ps| output rows, all exact integers
    (balance_micro = max·10⁶ DIV ceil-free exact mean via
    max·P·10⁶ DIV rows).
    """
    if not n_partitions or any(p < 1 for p in n_partitions):
        raise ValueError("n_partitions must be positive and non-empty")
    keys = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    key_int = F.conv(
        F.substring(F.md5(F.col("__k").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    fanned = keys.select(
        "__c",
        F.explode(
            F.array(*[F.lit(int(p)) for p in sorted(n_partitions)])
        ).alias("p"),
        key_int.alias("__h"),
    ).select("p", (F.col("__h") % F.col("p")).alias("__b"), "__c")
    per_bucket = fanned.groupBy("p", "__b").agg(
        F.sum("__c").cast("bigint").alias("__rows")
    )
    return per_bucket.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
        F.sum("__rows").cast("bigint").alias("n_rows"),
        F.max("__rows").cast("bigint").alias("max_rows"),
    ).select(
        "p",
        "buckets_used",
        "n_rows",
        "max_rows",
        # balance = max / (rows/P) exactly: max·P·10⁶ DIV rows
        F.expr("max_rows * p * 1000000 DIV n_rows")
        .cast("bigint")
        .alias("balance_micro"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    id_cols: list[str],
    prior_weight: int = 10,
) -> DataFrame:
    """Leave-one-out target encoding: each row's category encodes as
    the mean label of all OTHER rows in its category (smoothed toward
    the global mean with ``prior_weight`` pseudo-counts) — the
    standard fix for the self-leak in naive target encoding, where a
    row sees its own label and a high-cardinality category memorizes
    the target (``target_encode_pit`` guards the temporal axis; this
    guards the self axis — production uses both).

    enc(row) = (S_c − y_row + w·ȳ_global·) / (n_c − 1 + w), all in
    exact cents: enc_micro = (S_c·10⁴ − y·10⁴ + w·gsum·10⁴ DIV gn)
    DIV (n_c − 1 + w) — the global-mean term is itself a floored
    integer micro (documented ±1µ leak), every division truncating
    and engine-portable.  Singleton categories (n_c = 1) fall back to
    the pure smoothed prior.

    Plan: one |categories|-key aggregate, one broadcast 1-row global
    frame, one join of the per-category sums back (broadcast when
    |C| is small, hash otherwise — left to AQE); the label column is
    read once.  Output: id_cols + (category, enc_micro).
    """
    d38 = "decimal(38,0)"
    y = (F.col(label_col).cast("decimal(18,2)") * 100).cast(d38)
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(cat_col).alias("category"),
        y.alias("__y"),
    )
    per_cat = base.groupBy("category").agg(
        F.count(F.lit(1)).cast(d38).alias("__nc"),
        F.sum("__y").alias("__sc"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast(d38).alias("__gn"),
        F.sum("__y").alias("__gs"),
    ).select(
        F.expr("CAST(__gs * 10000 AS DECIMAL(38,0)) DIV __gn").alias(
            "__gmean_micro"
        )
    )
    w = int(prior_weight)
    joined = base.join(per_cat, "category").crossJoin(F.broadcast(glob))
    return joined.select(
        *id_cols,
        "category",
        F.expr(
            f"CAST((__sc - __y) * 10000 + {w} * __gmean_micro"
            f" AS DECIMAL(38,0)) DIV CAST(__nc - 1 + {w} AS DECIMAL(38,0))"
        )
        .cast("bigint")
        .alias("enc_micro"),
    )

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

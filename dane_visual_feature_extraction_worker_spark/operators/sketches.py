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

"""Joins: modality outer-merge with zero-fill, salted skew-safe join.

- ``outer_merge``: the reference merges keyframe and spectrogram maps on
  the timestamp key by updating one dict from two globs — a full outer
  join — and substitutes a zero tensor for an absent modality at read
  time (reference: data_handling.py:31-51 build; :93-99,106-109
  zero-fill). Spark version: ``full_outer`` join + ``coalesce`` with the
  zero value.

- ``salted_join``: the reference sidesteps skew structurally (one entity
  per queue job, worker.py:66-90). At 10^12 turns a hot conv_id melts a
  single shuffle partition, so the engine salts hot keys: fact side gets
  ``salt = pmod(xxhash64(...), n_salts)`` (hash util precedent
  base_util.py:205-206), the dim side is exploded across all salts, the
  join runs on (key, salt), results are identical to the unsalted join.
  AQE's skew-join split covers sort-merge joins automatically; explicit
  salting is for the cases AQE can't touch (grouped applyInPandas, or
  when the dim side must stay broadcast).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def outer_merge(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    fills: dict | None = None,
) -> DataFrame:
    """Full-outer join of two per-key feature tables with zero-fill.

    ``fills``: column -> fill literal (e.g. 0.0); applied to both sides'
    non-key columns where the other side had no row.
    """
    out = a.join(b, list(keys), "full_outer")
    for c, v in (fills or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side, explode the dim side.

    Result columns == plain ``fact.join(dim, key, how)``.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    ts_col: str | None = None,
) -> DataFrame:
    """Key-distribution diagnostic — the measurement that drives the
    salting decisions (`auto_salt_prefix_features` routes entities past
    a count threshold into the block-decomposed kernel; this report is
    how a job picks that threshold and whether to salt at all).

    Emits ONE row: key count, row count, max/mean key size, exact
    p50/p99 of key sizes, and `skew_factor` = max_rows / mean_rows
    (the straggler multiplier a single-task-per-key stage pays).
    Plan: one map-side-combined count per key, then a single-row
    rollup of the |keys|-sized frame — the corpus is read once,
    column-pruned to the key."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_rows"),
        (
            F.floor(
                F.sum("__n").cast("double")
                / F.count(F.lit(1))
                * 1e6
            )
            / 1e6
        ).alias("mean_rows"),
        F.percentile(F.col("__n"), F.lit(0.5)).alias("p50_rows"),
        F.percentile(F.col("__n"), F.lit(0.99)).alias("p99_rows"),
        (
            F.floor(
                F.max("__n").cast("double")
                / (F.sum("__n").cast("double") / F.count(F.lit(1)))
                * 1e6
            )
            / 1e6
        ).alias("skew_factor"),
    )


def bloom_join_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """Inner equi-join with an EXPLICIT Bloom-filter pre-prune of the
    fact side — result identical to ``fact.join(dim, ...)`` (false
    positives survive the prune but die in the exact join, so the
    filter's hash choice can never change the answer; that is what
    makes this gateable against a plain-join oracle).

    Why at 100 TB: when the dim side is too big to broadcast-join but
    its KEY SET still fits a few KB of bits, the shuffle join pays
    full freight on fact rows that can never match.  A Bloom filter of
    the dim keys applied BEFORE the exchange cuts shuffle bytes by the
    non-match fraction — this is Spark's own runtime row-level filter
    (spark.sql.optimizer.runtime.bloomFilter.*) made explicit and
    deterministic, for the paths the optimizer doesn't cover (e.g. a
    pre-filtered dim computed in the same job, or applyInPandas stages
    that hide the join from Catalyst).

    Plan: dim keys -> k xxhash64 positions -> groupBy word index with
    a bit_or rollup (m_bits/64 rows — KBs, collected and re-broadcast
    as an array LITERAL baked into the fact-side predicate, so the
    probe is pure whole-stage codegen: element_at + shift + mask, no
    UDF, no second scan of dim).  The final join stays an ordinary
    equi-join for Catalyst/AQE to strategize.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64

    def positions(col: F.Column) -> list[F.Column]:
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]

    pos = dim.select(
        F.explode(F.array(*positions(F.col(dim_key)))).alias("__p")
    )
    words_rows = (
        pos.groupBy((F.col("__p") / F.lit(64)).cast("int").alias("__w"))
        .agg(
            # F.shiftleft takes a Python-int shift; call the SQL
            # function directly for a Column-valued shift amount.
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("bigint"),
                    (F.col("__p") % 64).cast("int"),
                )
            ).alias("__bits")
        )
        .collect()
    )
    words = [0] * n_words
    for r in words_rows:
        words[r["__w"]] = r["__bits"]
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])

    pred = None
    for p in positions(F.col(fact_key)):
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftrightunsigned", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("bigint")) == F.lit(1)
        pred = bit if pred is None else (pred & bit)

    pruned = fact.where(pred)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    k: int = 10,
) -> DataFrame:
    """EXACT inner-join output size and its hot keys WITHOUT executing
    the join: |A ⋈ B| = Σ_k c_A(k)·c_B(k) over the two key-count
    frames. ``skew_report`` diagnoses ONE table's key distribution;
    this prices the JOIN — the number that decides broadcast vs
    shuffle vs salted BEFORE a 10^12×10^9 join is launched (a single
    hot key contributing 40% of the product is the AQE-skew-split /
    salting trigger, visible here for the cost of two count
    aggregates instead of the join itself).

    Output: top-k keys by pair count (desc, key asc) with their exact
    product share, plus a ``__total__`` row (key = NULL-safe '-1'
    string) carrying Σ products. Products ride decimal(38,0)
    (c_A·c_B ≤ 10²⁴ at hot-key scale).

    Plan: one map-side-combined count per side (corpus columns pruned
    to the key), a key-frame-sized inner join (AQE co-planned), a
    k-row TakeOrdered + one scalar rollup — the fact tables never
    shuffle full rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    d38 = "decimal(38,0)"
    ca = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_left")
    )
    cb = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_right")
    )
    prod = ca.join(cb, "key").select(
        F.col("key").cast("string").alias("key"),
        "c_left",
        "c_right",
        (F.col("c_left").cast(d38) * F.col("c_right").cast(d38))
        .cast(d38)
        .alias("__p"),
    )
    total = prod.agg(
        F.sum("__p").cast(d38).alias("__tot"),
        F.count(F.lit(1)).cast("bigint").alias("__nk"),
    )
    top = (
        prod.orderBy(F.col("__p").desc(), F.col("key"))
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "c_left",
            "c_right",
            F.col("__p").cast(d38).alias("pairs"),
            F.expr(
                "CAST(__p * CAST(1000000 AS decimal(38,0))"
                " DIV __tot AS BIGINT)"
            ).alias("share_micro"),
        )
    )
    tot_row = total.select(
        F.lit("__total__").alias("key"),
        F.lit(None).cast("bigint").alias("c_left"),
        F.col("__nk").alias("c_right"),  # matched key count
        F.col("__tot").alias("pairs"),
        F.lit(1_000_000).cast("bigint").alias("share_micro"),
    )
    return top.unionByName(tot_row)


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_val: F.Column,
    right_val: F.Column,
    eps: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Numeric band join: pairs with |left_val − right_val| <= eps
    (exact integers — quantize to cents at the call site), optionally
    co-keyed on ``on`` equality columns.  The reconciliation join
    ("find the ledger entry within 5 cents of this payment") that a
    naive engine plans as a THETA join — quadratic per key group and
    unshufflable.

    Plan — the standard bucketed band decomposition: left rows
    replicate into the 3 buckets {b−1, b, b+1} with b = val DIV eps
    (a 3× narrow explode, no data-dependent fan-out); right rows keep
    their single bucket; the join is a pure EQUI-join on
    (on…, bucket) — hash-partitionable, AQE-skew-splittable — and the
    exact |Δ| <= eps filter runs post-join.  Every qualifying pair
    matches in EXACTLY one bucket (the right row's own), so no dedup
    pass is needed.  Work is |left|·3 + matches; the theta plan's
    per-group quadrat never materializes.  DIV truncation makes the
    near-zero bucket twice as wide — a performance detail only, the
    filter is exact.
    """
    if eps <= 0:
        raise ValueError("eps must be positive")
    lv = left_val.cast("bigint")
    rv = right_val.cast("bigint")
    l = left.select(
        *[F.col(c) for c in on],
        *[F.col(c) for c in left_cols],
        lv.alias("__lv"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.expr(f"__lv DIV {eps} - 1"),
                F.expr(f"__lv DIV {eps}"),
                F.expr(f"__lv DIV {eps} + 1"),
            )
        ),
    )
    r = right.select(
        *[F.col(c) for c in on],
        *[F.col(c) for c in right_cols],
        rv.alias("__rv"),
    ).withColumn("__bucket", F.expr(f"__rv DIV {eps}"))
    j = l.join(r, [*on, "__bucket"])
    return j.where(
        F.abs(F.col("__lv") - F.col("__rv")) <= eps
    ).select(
        *on,
        *left_cols,
        *right_cols,
        F.col("__lv").alias("left_val"),
        F.col("__rv").alias("right_val"),
        (F.col("__lv") - F.col("__rv")).alias("diff"),
    )

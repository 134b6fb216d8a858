"""wilson_lower_bounds / kmv_overlap batch."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_wilson_small_n_loses_to_big_n(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        wilson_lower_bounds,
    )

    rows = (
        [("small", "s")] * 2                          # 2/2 = 100%
        + [("big", "s")] * 180 + [("big", "f")] * 20  # 180/200 = 90%
    )
    df = spark.createDataFrame(rows, "g string, r string")
    got = {
        r["group"]: r
        for r in wilson_lower_bounds(
            df, "g",
            success=F.col("r") == "s",
            trial=F.lit(True),
        ).collect()
    }
    assert got["small"]["rate_micro"] == 1_000_000
    assert got["big"]["rate_micro"] == 900_000
    # the ranking statistic inverts the raw-rate order
    assert got["big"]["wilson_lb_micro"] > got["small"]["wilson_lb_micro"]


def test_wilson_matches_closed_form(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        wilson_lower_bounds,
    )

    s, n = 7, 10
    rows = [("g", "s")] * s + [("g", "f")] * (n - s)
    df = spark.createDataFrame(rows, "g string, r string")
    r = wilson_lower_bounds(
        df, "g", success=F.col("r") == "s", trial=F.lit(True)
    ).first()
    z = 1.959963984540054
    p = s / n
    lb = (p + z * z / (2.0 * n)
          - z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) \
        / (1.0 + z * z / n)
    assert r["wilson_lb_micro"] == math.floor(lb * 1e6)


def test_wilson_zero_trials_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        wilson_lower_bounds,
    )

    df = spark.createDataFrame([("g", "x")], "g string, r string")
    r = wilson_lower_bounds(
        df, "g", success=F.col("r") == "s", trial=F.lit(False)
    ).first()
    assert r["n_trials"] == 0
    assert r["wilson_lb_micro"] is None and r["rate_micro"] is None


def test_kmv_overlap_exact_below_k(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_overlap,
    )

    # A = {0..9}, B = {5..14}: |A∩B| = 5, |A∪B| = 15, all below k
    rows = [(i, "a") for i in range(10)] + [(i, "b") for i in range(5, 15)]
    df = spark.createDataFrame(rows, "v long, s string")
    r = kmv_overlap(
        df, "v",
        in_a=F.col("s") == "a",
        in_b=F.col("s") == "b",
        k=64,
    ).first()
    assert r["est_a"] == 10 and r["est_b"] == 10
    assert r["est_union"] == 15
    assert r["n_common_in_k"] == 5
    assert r["jaccard_micro"] == 5 * 1_000_000 // 15
    assert r["est_intersection"] == r["jaccard_micro"] * 15 // 1_000_000


def test_kmv_overlap_estimator_reasonable(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_overlap,
    )

    # 2000 shared + 2000 only-A + 2000 only-B, k=128
    rows = (
        [(i, "a") for i in range(4000)]
        + [(i, "b") for i in range(2000, 6000)]
    )
    df = spark.createDataFrame(rows, "v long, s string")
    r = kmv_overlap(
        df, "v",
        in_a=F.col("s") == "a",
        in_b=F.col("s") == "b",
        k=128,
    ).first()
    assert r["n_kept_a"] == 128 and r["n_kept_union"] == 128
    # KMV relative error ~ 1/sqrt(k) ≈ 9%; allow 3 sigma
    assert abs(r["est_a"] - 4000) < 4000 * 0.27
    assert abs(r["est_union"] - 6000) < 6000 * 0.27
    assert abs(r["jaccard_micro"] - 333_333) < 333_333 * 0.5


def test_kmv_overlap_disjoint_sets(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_overlap,
    )

    rows = [(i, "a") for i in range(20)] + [(i + 100, "b") for i in range(20)]
    df = spark.createDataFrame(rows, "v long, s string")
    r = kmv_overlap(
        df, "v", in_a=F.col("s") == "a", in_b=F.col("s") == "b", k=64
    ).first()
    assert r["n_common_in_k"] == 0
    assert r["jaccard_micro"] == 0 and r["est_intersection"] == 0

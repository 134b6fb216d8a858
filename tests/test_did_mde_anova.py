"""diff_in_diff / mde_report / anova_eta_squared batch."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _did(spark, rows):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        diff_in_diff,
    )

    df = spark.createDataFrame(rows, "t boolean, p boolean, value double")
    return diff_in_diff(
        df, treated=F.col("t"), post=F.col("p"), value_col="value"
    ).first()


def test_did_parallel_trends_is_zero(spark):
    rows = (
        [(True, False, 10.0)] * 3 + [(True, True, 15.0)] * 3     # +5
        + [(False, False, 2.0)] * 4 + [(False, True, 7.0)] * 4   # +5
    )
    r = _did(spark, rows)
    assert r["did_micro"] == 0
    assert r["mean_treat_post_micro"] == 15_000_000


def test_did_detects_lift(spark):
    rows = (
        [(True, False, 10.0)] * 2 + [(True, True, 18.0)] * 2     # +8
        + [(False, False, 10.0)] * 2 + [(False, True, 13.0)] * 2  # +3
    )
    r = _did(spark, rows)
    assert r["did_micro"] == 5_000_000


def test_did_empty_cell_is_null(spark):
    rows = [(True, True, 1.0), (False, True, 1.0), (False, False, 1.0)]
    r = _did(spark, rows)
    assert r["did_micro"] is None
    assert r["n_treat_pre"] == 0
    assert r["mean_treat_pre_micro"] is None


def test_mde_matches_closed_form(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        mde_report,
    )

    a = [4.0, 6.0, 5.0, 7.0, 3.0]
    b = [10.0, 14.0, 12.0, 16.0, 8.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, value double")
    r = mde_report(df, "g", "value", "a", "b").first()
    za, zb = 1.959963984540054, 0.8416212335729143

    def var(xs):
        n = len(xs)
        s, s2 = sum(xs), sum(x * x for x in xs)
        return (n * s2 - s * s) / (n * (n - 1))

    va = var([x * 100 for x in a])
    vb = var([x * 100 for x in b])
    mde = (za + zb) * math.sqrt(va / 5 + vb / 5)
    assert r["mde_microcents"] == math.floor(mde * 1e6)
    assert r["n_a"] == 5 and r["n_b"] == 5
    pooled = (sum(a) + sum(b)) * 100 / 10
    assert r["mde_rel_micro"] == math.floor(mde / pooled * 1e6)


def test_mde_needs_two_per_arm(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        mde_report,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, value double"
    )
    r = mde_report(df, "g", "value", "a", "b").first()
    assert r["mde_microcents"] is None


def test_anova_eta_perfect_separation(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        anova_eta_squared,
    )

    # group means differ, zero within-group variance -> eta2 = 1
    rows = [("a", 1.0)] * 3 + [("b", 5.0)] * 3
    df = spark.createDataFrame(rows, "g string, value double")
    r = anova_eta_squared(df, "g").first()
    assert r["eta2_micro"] == 1_000_000
    assert r["k_groups"] == 2 and r["n"] == 6


def test_anova_eta_no_effect(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        anova_eta_squared,
    )

    # identical distribution in both groups -> eta2 = 0
    rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = anova_eta_squared(df, "g").first()
    assert r["eta2_micro"] == 0


def test_anova_eta_matches_brute(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        anova_eta_squared,
    )

    data = {"a": [1.0, 2.0, 4.0], "b": [3.0, 5.0], "c": [10.0, 11.0, 9.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, value double")
    r = anova_eta_squared(df, "g").first()
    cents = {g: [v * 100 for v in vs] for g, vs in data.items()}
    allv = [x for vs in cents.values() for x in vs]
    gm = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2
              for vs in cents.values())
    sst = sum((x - gm) ** 2 for x in allv)
    assert abs(r["eta2_micro"] - ssb / sst * 1e6) <= 2


def test_anova_eta_constant_values_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        anova_eta_squared,
    )

    rows = [("a", 2.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = anova_eta_squared(df, "g").first()
    assert r["eta2_micro"] is None  # SS_total = 0: undefined, surfaced

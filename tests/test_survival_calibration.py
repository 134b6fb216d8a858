"""Unit tests for the survival / calibration / DQ / silhouette /
percentile-rank batch: each operator against an independent
brute-force recompute (numpy / pandas / pure Python), never against
its own plan."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F


def _events_df(spark, n=3000, n_users=40):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + (F.col("id") * 997 % 500_000))
        .alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"),
                F.lit("error"),
            ),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") * 37 % 9973) / 100.0).alias("value"),
    )


def test_km_survival_matches_brute_force(spark):
    """KM curve parity vs the textbook estimator computed in numpy on
    the collected per-user spans (counts exact; survival within the
    1e-6 floor of the float product)."""
    from dane_visual_feature_extraction_worker_spark.operators.survival import (
        km_survival,
    )

    e = _events_df(spark)
    got = {r["duration_hours"]: r for r in km_survival(e, horizon_hours=24).collect()}

    rows = e.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).toPandas()
    spans = rows.groupby("user_id")["us"].agg(["min", "max"])
    cut = spans["max"].max()
    dur = ((spans["max"] - spans["min"]) // 3_600_000_000).astype(int)
    obs = ((cut - spans["max"]) > 24 * 3_600_000_000).astype(int)

    total = len(spans)
    expect_s = {}
    s = 1.0
    consumed = 0
    for t in sorted(dur.unique()):
        at = dur == t
        d = int(obs[at].sum())
        c = int((~obs[at].astype(bool)).sum())
        n_risk = total - consumed
        consumed += d + c
        if d > 0:
            s *= (n_risk - d) / n_risk
        expect_s[t] = (n_risk, d, c, s)

    assert set(got) == set(expect_s)
    for t, (n_risk, d, c, s) in expect_s.items():
        g = got[t]
        assert g["n_at_risk"] == n_risk and g["n_events"] == d
        assert g["n_censored"] == c
        # micro-nat accumulation: within 1e-4 of the float product
        assert abs(g["survival"] - s) < 1e-4


def test_calibration_bins_brute_force(spark):
    """Bin counts / rates / Brier terms vs a numpy recompute on random
    scores; the weighted Brier total reconstructs the global Brier."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        calibration_bins,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(0, 1_000_001, size=5000)
    y = (rng.random(5000) < s / 1e6).astype(int)  # calibrated-ish
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(s, y)], "s long, y long"
    )
    out = {r["bin"]: r for r in calibration_bins(df, F.col("s"), F.col("y")).collect()}

    bins = np.minimum(s * 10 // 1_000_000, 9)
    for b in np.unique(bins):
        m = bins == b
        r = out[int(b)]
        assert r["n"] == int(m.sum())
        assert r["frac_pos"] == math.floor(y[m].mean() * 1e6) / 1e6
        exp_brier = ((s[m] / 1e6 - y[m]) ** 2).mean()
        assert abs(r["brier_term"] - exp_brier) < 1e-5
    total_n = sum(r["n"] for r in out.values())
    global_brier = sum(r["n"] * r["brier_term"] for r in out.values()) / total_n
    assert abs(global_brier - ((s / 1e6 - y) ** 2).mean()) < 1e-5


def test_ab_report_counts_and_z(spark):
    """Arm counts vs a pandas recompute of the same md5 parity; z
    formula vs numpy."""
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        sample_key,
    )
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        ab_conversion_report,
    )

    e = _events_df(spark)
    r = ab_conversion_report(e).collect()[0]

    per = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select(
            (sample_key(F.col("user_id"), "ab") % 2).alias("arm"), "conv"
        )
        .toPandas()
    )
    a = per[per.arm == 0]
    b = per[per.arm == 1]
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["conv_a"] == int(a.conv.sum())
    assert r["conv_b"] == int(b.conv.sum())
    pa, pb = a.conv.mean(), b.conv.mean()
    pooled = per.conv.mean()
    se = math.sqrt(pooled * (1 - pooled) * (1 / len(a) + 1 / len(b)))
    assert abs(r["z_score"] - (pa - pb) / se) < 1e-5


def test_dq_expectations_counts_violations(spark):
    """Known-bad rows are counted per rule; NULL fails a value rule;
    FK orphans (including NULL keys) are counted."""
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        expectations_report,
        fk_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)],
        "id long, amount double",
    )
    rep = {
        r["rule"]: r
        for r in expectations_report(
            df, {"amount_positive": F.col("amount") > 0}, table="t"
        ).collect()
    }
    assert rep["amount_positive"]["n_checked"] == 4
    assert rep["amount_positive"]["n_failed"] == 2  # -5 and NULL

    child = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 999), (4, None)], "id long, k long"
    )
    parent = spark.createDataFrame([(100,), (200,)], "k long")
    fk = fk_violations(child, parent, "k", "k", table="t", rule="fk").collect()[0]
    assert fk["n_checked"] == 4 and fk["n_failed"] == 2  # 999 and NULL


def test_cluster_silhouette_brute_force(spark):
    """Per-point silhouette vs a numpy recompute of the same
    centroid-approximated definition on the same micro grid."""
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        cluster_silhouette,
    )

    rng = np.random.default_rng(11)
    dim, n = 8, 300
    centers = rng.normal(0, 2.0, size=(3, dim))
    labels = rng.integers(0, 3, size=n)
    x = centers[labels] + rng.normal(0, 0.5, size=(n, dim))
    df = spark.createDataFrame(
        [
            (i, [float(v) for v in x[i]], int(labels[i]))
            for i in range(n)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["vec_id"]: r for r in cluster_silhouette(df).collect()}

    xq = np.floor(x.astype(np.float32).astype(np.float64) * 1e6).astype(
        np.int64
    )
    cents = np.stack(
        [
            np.floor(xq[labels == c].sum(0) / (labels == c).sum()).astype(
                np.int64
            )
            for c in range(3)
        ]
    )
    for i in range(n):
        d2 = ((xq[i] - cents) ** 2).sum(1)
        a2 = d2[labels[i]]
        b2 = min(d2[c] for c in range(3) if c != labels[i])
        g = got[i]
        assert g["a2"] == a2 and g["b2"] == b2
        a, b = math.sqrt(a2), math.sqrt(b2)
        exp = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        assert abs(g["silhouette"] - exp) < 2e-6


def test_rolling_percent_rank_brute_force(spark):
    """Every row's trailing-k rank vs a pure-Python sliding window;
    first row per entity is NULL (no fake 0)."""
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_percent_rank,
    )

    e = _events_df(spark, n=800, n_users=7)
    k = 5
    got = rolling_percent_rank(e, k=k).collect()

    rows = sorted(
        e.select("user_id", "ts", "event_id", "value").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    hist: dict[int, list[int]] = {}
    expect = {}
    for r in rows:
        cents = math.floor(r["value"] * 100)
        h = hist.setdefault(r["user_id"], [])
        prior = h[-k:]
        if prior:
            n_le = sum(1 for v in prior if v <= cents)
            expect[r["event_id"]] = (
                len(prior),
                n_le,
                n_le * 1_000_000 // len(prior),
            )
        else:
            expect[r["event_id"]] = (None, None, None)
        h.append(cents)

    assert len(got) == len(rows)
    for g in got:
        np_, nle, pct = expect[g["event_id"]]
        assert (g["n_prior"], g["n_le"], g["pct_rank_micro"]) == (
            np_,
            nle,
            pct,
        )

"""Unit tests for the BH-FDR / IPW-ATE / split-conformal batch: each
operator against an independent brute-force recompute (pure Python /
pandas), never against its own plan."""

from __future__ import annotations

import pyspark.sql.functions as F


def _events_df(spark, n=4000, n_users=40):
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
            # % 7 % 4 decouples type from id parity (the conformal
            # calib/test split) — plain id % 4 puts two of the four
            # types entirely on even ids
            (F.col("id") % 7 % 4 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") * 37 % 9973) / 100.0).alias("value"),
    )


def test_bh_fdr_matches_brute_force_with_planted_effect(spark):
    """Plant one slice with a far higher success rate; the brute-force
    BH procedure (chi2 + Markov p-bound, sorted, largest-k rule) must
    agree on ranks, k_star, and the rejected set."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        bh_fdr_report,
    )

    # slice = id % 10; slice 3 succeeds 80% of the time, others ~5%
    df = spark.range(5000).select(
        (F.col("id") % 10).cast("bigint").alias("slc"),
        (
            F.when(F.col("id") % 10 == 3, F.col("id") % 5 < 4).otherwise(
                F.col("id") % 20 == 0
            )
        ).alias("succ"),
    )
    got = {
        r["slice_key"]: r
        for r in bh_fdr_report(df, "slc", F.col("succ")).collect()
    }

    rows = df.groupBy("slc").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("succ").cast("int")).alias("s"),
    ).collect()
    nt = sum(r["n"] for r in rows)
    st = sum(r["s"] for r in rows)
    stats = []
    for r in rows:
        n1, s1 = float(r["n"]), float(r["s"])
        n0, s0 = float(nt - r["n"]), float(st - r["s"])
        den = n1 * n0 * float(st) * (float(nt) - float(st))
        if den > 0.0:
            cross = s1 * (n0 - s0) - s0 * (n1 - s1)
            chi2 = float(nt) * cross * cross / den
        else:
            chi2 = 0.0
        stats.append((r["slc"], chi2))
    stats.sort(key=lambda t: (-t[1], t[0]))
    m = len(stats)
    kstar = 0
    for i, (_, chi2) in enumerate(stats, start=1):
        if chi2 * float(i) * 1.0 >= float(m) * 20.0:
            kstar = i
    assert got[3]["rejected"] == 1  # the planted slice is found
    for i, (slc, chi2) in enumerate(stats, start=1):
        g = got[slc]
        assert g["rank"] == i
        assert g["k_star"] == kstar
        assert g["rejected"] == (1 if i <= kstar else 0)
        assert g["chi2_micro"] == int(chi2 * 1_000_000.0 // 1)
    # one-vs-rest: the hot slice drags the global rate up, so the flat
    # 5% slices are ALSO significant vs "rest" — the rejected set is
    # whatever brute-force BH says (asserted row-by-row above), and the
    # planted slice must carry the top rank
    assert got[3]["rank"] == 1


def test_bh_fdr_no_effect_rejects_nothing(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        bh_fdr_report,
    )

    e = _events_df(spark)
    out = bh_fdr_report(
        e, F.hour("ts").cast("bigint"), F.col("event_type") == "purchase"
    ).collect()
    assert all(r["rejected"] == 0 for r in out)
    assert all(r["k_star"] == 0 for r in out)
    assert {r["rank"] for r in out} == set(range(1, len(out) + 1))


def test_ipw_ate_matches_brute_force_and_positivity(spark):
    """Stratified estimator vs a pandas recompute with the same micro
    truncation; a stratum with only treated rows must be dropped and
    counted."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        ipw_ate_report,
    )

    # stratum = id % 5: coprime with the fixture's 7-cycle type
    # assignment, so every stratum sees every event_type
    e = _events_df(spark).withColumn(
        "stratum", (F.col("event_id") % 5).cast("bigint")
    )
    # make stratum 4 treated-only by relabeling its views to clicks
    e = e.withColumn(
        "event_type",
        F.when(
            (F.col("stratum") == 4) & (F.col("event_type") == "view"),
            F.lit("click"),
        ).otherwise(F.col("event_type")),
    )
    row = ipw_ate_report(
        e,
        F.col("event_type") == "click",
        F.col("event_type") == "view",
        "value",
        F.col("stratum"),
    ).collect()[0]

    pdf = e.where(F.col("event_type").isin("click", "view")).select(
        "stratum", "event_type", "value"
    ).toPandas()
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    num = den = 0
    used = dropped = 0
    for s, g in pdf.groupby("stratum"):
        t = g[g["event_type"] == "click"]["cents"]
        c = g[g["event_type"] == "view"]["cents"]
        if len(t) == 0 or len(c) == 0:
            dropped += 1
            continue
        used += 1
        dm = int(t.sum()) * 10_000 // len(t) - int(c.sum()) * 10_000 // len(c)
        num += len(g) * dm
        den += len(g)
    assert row["n_strata_dropped"] == dropped == 1
    assert row["n_strata_used"] == used == 4
    # Spark DIV (and DuckDB //) truncate toward zero; Python // floors
    expect_ate = num // den if num >= 0 else -((-num) // den)
    assert row["ate_micro"] == expect_ate
    t = pdf[pdf["event_type"] == "click"]["cents"]
    c = pdf[pdf["event_type"] == "view"]["cents"]
    naive = int(t.sum()) * 10_000 // len(t) - int(c.sum()) * 10_000 // len(c)
    assert row["naive_diff_micro"] == naive
    assert row["n_treat"] == len(t) and row["n_ctrl"] == len(c)


def test_conformal_matches_brute_force_order_statistic(spark):
    """qhat must equal the k-th smallest calibration residual with
    k = ceil((n+1)*0.9), and coverage the exact holdout share."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        conformal_interval_report,
    )

    e = _events_df(spark)
    out = {
        r["grp"]: r
        for r in conformal_interval_report(
            e, "event_type", "value", "event_id", 9, 10
        ).collect()
    }

    pdf = e.select("event_id", "event_type", "value").toPandas()
    pdf["y"] = (pdf["value"] * 100).round().astype("int64") * 10_000
    for grp, g in pdf.groupby("event_type"):
        cal = g[g["event_id"] % 2 == 0]
        tst = g[g["event_id"] % 2 == 1]
        n = len(cal)
        yhat = int(cal["y"].sum()) // n
        k = ((n + 1) * 9 + 9) // 10
        res = sorted((cal["y"] - yhat).abs())
        r = out[grp]
        assert r["n_calib"] == n and r["n_test"] == len(tst)
        assert r["yhat_micro"] == yhat
        if k <= n:
            assert r["qhat_micro"] == res[k - 1]
            cov = int(((tst["y"] - yhat).abs() <= res[k - 1]).sum())
            assert r["coverage_micro"] == cov * 1_000_000 // len(tst)
            # split-conformal at level .9 should land near .9
            assert 800_000 <= r["coverage_micro"] <= 1_000_000
        else:
            assert r["qhat_micro"] is None


def test_conformal_tiny_calibration_yields_null_qhat(spark):
    """k = ceil((n+1)*0.9) > n for n < 9: the interval is honestly
    infinite (NULL qhat, NULL coverage), never a clamped max."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        conformal_interval_report,
    )

    df = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit("g").alias("grp"),
        (F.col("id") * 1.5).alias("value"),
    )
    row = conformal_interval_report(
        df, "grp", "value", "event_id", 9, 10
    ).collect()[0]
    assert row["n_calib"] == 5 and row["n_test"] == 5
    assert row["qhat_micro"] is None and row["coverage_micro"] is None

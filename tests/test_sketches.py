"""Sketch-twin tolerance contract (operators/sketches.approx_profile)
plus unit tests for the round-5 second-half operator batch: robust
outliers, exact-sum Pearson, rolling distinct, dataset mixing, PMI
collocations, and ring-shift negative sampling."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _events_df(spark, n=2000, n_users=25):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 7).alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 13).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") * 37 % 9973) / 100.0).alias("value"),
    )


def test_approx_profile_within_published_bounds(spark):
    """HLL estimate within 5*rsd of exact; GK percentiles within the
    rank-error bound translated to values."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        approx_profile,
    )

    e = _events_df(spark).cache()
    est = {r["user_id"]: r for r in approx_profile(e, rsd=0.02).collect()}
    exact = {
        r["user_id"]: r
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("event_type").alias("nd"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for u, r in est.items():
        x = exact[u]
        assert r["n_rows"] == x["n"]
        # HLL++: rsd=0.02 -> 5 sigma = 10%
        assert abs(r["n_distinct_est"] - x["nd"]) <= max(1, 0.10 * x["nd"])
        # GK with accuracy A admits rank error n/A; per-user n ~ 80
        # with A=1000 -> exact rank, so values must be actual data
        # points near the true percentile (loose value tolerance).
        assert abs(r["p50_est"] - x["p50"]) <= 0.15 * (abs(x["p50"]) + 1)
        assert abs(r["p95_est"] - x["p95"]) <= 0.15 * (abs(x["p95"]) + 1)
    e.unpersist()


def test_approx_profile_single_aggregate_plan(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        approx_profile,
    )

    plan = approx_profile(_events_df(spark))._jdf.queryExecution().executedPlan().toString()
    # one partial + one final aggregate pair, a single exchange
    assert plan.count("Exchange") == 1


def test_robust_outliers_flags_planted_spike(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        robust_outliers,
    )

    base = spark.range(500).select(
        F.col("id").alias("event_id"),
        (10.0 + (F.col("id") % 7) / 10.0).alias("value"),
    )
    spike = spark.range(1).select(
        (F.col("id") + 10_000).alias("event_id"), F.lit(9_999.0).alias("value")
    )
    out = robust_outliers(base.unionByName(spike), value="value", k=3)
    flagged = {r["event_id"] for r in out.where("is_outlier").collect()}
    assert flagged == {10_000}
    # deviation is exact cents math
    dev = dict(out.select("event_id", "deviation").collect())
    assert abs(dev[0] - (10.0 - 10.3)) < 1e-9  # median of 10.0..10.6 grid


def test_pearson_corr_exact_matches_numpy(spark):
    import numpy as np

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pearson_corr_exact,
    )

    df = _events_df(spark, n=1500)
    feats = {
        "uid": F.col("user_id"),
        "etype_num": F.length("event_type"),
    }
    label = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    got = {r["feature"]: r for r in pearson_corr_exact(df, feats, label).collect()}
    pd = df.toPandas()
    y = (pd["value"] * 100).round().astype("int64")
    for name, x in {
        "uid": pd["user_id"],
        "etype_num": pd["event_type"].str.len(),
    }.items():
        expect = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
        assert got[name]["n"] == len(pd)
        assert math.isclose(got[name]["r"], expect, abs_tol=2e-6)


def test_pearson_constant_feature_is_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        pearson_corr_exact,
    )

    df = _events_df(spark, n=100)
    row = pearson_corr_exact(
        df, {"const": F.lit(7)}, F.col("user_id")
    ).collect()[0]
    assert row["r"] is None


def test_rolling_distinct_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_distinct,
    )

    df = _events_df(spark, n=400, n_users=5)
    got = {
        (r["user_id"], r["event_id"]): r["n_distinct_k"]
        for r in rolling_distinct(df, k=8).collect()
    }
    pd = df.toPandas().sort_values(["user_id", "ts", "event_id"])
    for uid, g in pd.groupby("user_id"):
        vals = list(g["event_type"])
        ids = list(g["event_id"])
        for i in range(len(vals)):
            window = vals[max(0, i - 7) : i + 1]
            assert got[(uid, ids[i])] == len(set(window))


def test_dataset_mix_epochs_and_drop(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        dataset_mix,
    )

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    out = dataset_mix(
        docs, weights={"s0": 2.0, "s1": 0.5, "s2": 1.25}, salt="t"
    ).cache()
    by_src = dict(
        out.groupBy("source").count().collect()
    )
    assert by_src["s0"] == 200  # exactly 2 epochs, no fractional draw
    assert 20 <= by_src["s1"] <= 80  # ~50 of 100
    assert 100 <= by_src["s2"] <= 150  # 1 full epoch + ~25
    assert "s3" not in by_src  # outside the manifest -> dropped
    # copies of the same doc are distinct rows keyed by copy_idx
    m = out.where("source = 's0'").groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in m)
    # determinism
    again = dataset_mix(
        docs, weights={"s0": 2.0, "s1": 0.5, "s2": 1.25}, salt="t"
    )
    assert again.exceptAll(out).count() == 0 and out.exceptAll(again).count() == 0
    out.unpersist()


def test_pmi_prefers_exclusive_pair(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        pmi_topk,
    )

    rows = (
        [("alpha beta",)] * 10  # always together -> high PMI
        + [("common filler",)] * 5
        + [("common word",)] * 20
        + [("word filler",)] * 20
    )
    docs = spark.createDataFrame(rows, "text string").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    top = pmi_topk(docs, k=3, min_count=3).collect()
    assert (top[0]["w1"], top[0]["w2"]) == ("alpha", "beta")
    assert top[0]["pmi_micro"] > 0


def test_negative_pairs_ring_properties(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        negative_pairs,
    )

    pairs = spark.range(200).select(
        F.concat(F.lit("c"), (F.col("id") % 40).cast("string")).alias(
            "conv_id"
        ),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("prompt"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("response"),
    )
    out = negative_pairs(pairs, n_shards=4, salt="x").cache()
    assert out.count() == 200
    # every response text is unique here, so a ring over shards of
    # size >= 2 never self-pairs; with 200 rows over 4 shards all
    # shards are >= 2 elements
    assert out.where("is_self").count() == 0
    # the negative really is some other example's response
    resp = {r["response"] for r in pairs.select("response").collect()}
    assert all(r["neg_response"] in resp for r in out.collect())
    # deterministic redraw with a different salt changes the pairing
    out2 = negative_pairs(pairs, n_shards=4, salt="y")
    joined = out.alias("a").join(
        out2.alias("b"), ["conv_id", "turn_idx"]
    ).where("a.neg_response <> b.neg_response")
    assert joined.count() > 0
    out.unpersist()


def test_hll_distinct_error_bound_and_scaled_sum(spark):
    """Deterministic HLL: estimate within the published 3*1.04/sqrt(256)
    (~19.5%) of exact for every group; s_scaled consistent with the
    register count; small groups hit the linear-counting branch and
    land much tighter."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        hll_distinct,
    )

    e = _events_df(spark, n=6000, n_users=400)
    out = {r["event_type"]: r for r in hll_distinct(e, value="user_id").collect()}
    exact = {
        r["event_type"]: r["nd"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("nd"))
        .collect()
    }
    assert set(out) == set(exact)
    for t, r in out.items():
        assert r["n_exact"] == exact[t]
        rel = abs(r["hll_estimate"] - exact[t]) / exact[t]
        assert rel <= 3 * 1.04 / math.sqrt(256), (t, r["hll_estimate"], exact[t])
        assert 1 <= r["n_registers"] <= 256
        # every register term is in [1, 2^25]; empties contribute 2^25
        assert r["s_scaled"] <= 256 * (1 << 25)
        assert r["s_scaled"] >= r["n_registers"] + (256 - r["n_registers"]) * (1 << 25)


def test_hll_distinct_linear_counting_small_group(spark):
    """A 3-distinct group must resolve via linear counting, within 1."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        hll_distinct,
    )

    df = spark.createDataFrame(
        [("a", i % 3) for i in range(50)], "event_type string, user_id int"
    )
    r = hll_distinct(df).collect()[0]
    assert r["n_exact"] == 3
    assert abs(r["hll_estimate"] - 3) <= 1.0


def test_logbucket_quantiles_gamma2_bound(spark):
    """Every quantile estimate bucket covers the TRUE discrete quantile
    (the cumulative-rank definition), i.e. lo <= true_cents <= hi —
    the gamma=2 relative-error contract."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        logbucket_quantiles,
    )

    e = _events_df(spark, n=4000)
    out = logbucket_quantiles(e).collect()
    cents = {
        t: sorted(
            r["c"]
            for r in e.where(F.col("event_type") == t)
            .select((F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"))
            .collect()
        )
        for t in {r["event_type"] for r in out}
    }
    assert len(out) == 3 * len(cents)
    for r in out:
        xs = cents[r["event_type"]]
        assert r["n"] == len(xs)
        rank = -(-int(round(r["q"] * 1e6)) * len(xs) // 1_000_000)  # ceil
        true = xs[rank - 1]
        if true <= 0:
            assert r["bucket"] == 0
        else:
            assert r["lo_cents"] <= true <= r["hi_cents"], (r, true)


def test_logbucket_quantiles_zero_and_negative_clamp(spark):
    """cents <= 0 all land in bucket 0 with lo = hi = 0."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        logbucket_quantiles,
    )

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 0.0), ("a", 1.0)],
        "event_type string, value double",
    )
    out = {r["q"]: r for r in logbucket_quantiles(df).collect()}
    assert out[0.5]["bucket"] == 0 and out[0.5]["lo_cents"] == 0
    # p99 rank = ceil(0.99*4) = 4 -> cents=100 -> bucket 7 (64..127)
    assert out[0.99]["bucket"] == 7
    assert out[0.99]["lo_cents"] == 64 and out[0.99]["hi_cents"] == 127

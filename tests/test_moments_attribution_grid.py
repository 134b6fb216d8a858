"""moment_profile / first_touch_attribution / activity_grid batch."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F


def _profile(spark, values, group="g"):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        moment_profile,
    )

    df = spark.createDataFrame(
        [(group, v) for v in values], "g string, value double"
    )
    return {r["grp"]: r for r in moment_profile(df, "g", "value").collect()}


def _brute_moments(values):
    """Reference g1/g2 from exact integer cents, replaying the
    operator's fixed IEEE op order."""
    cents = [round(v * 100) for v in values]
    n = len(cents)
    nd = float(n)
    r1 = float(sum(cents)) / nd
    r2 = float(sum(c * c for c in cents)) / nd
    r3 = float(sum(c**3 for c in cents)) / nd
    r4 = float(sum(c**4 for c in cents)) / nd
    m2 = r2 - r1 * r1
    m3 = r3 - 3.0 * r1 * r2 + 2.0 * r1 * r1 * r1
    m4 = r4 - 4.0 * r1 * r3 + 6.0 * r1 * r1 * r2 - 3.0 * r1 * r1 * r1 * r1
    g1 = m3 / (m2 * math.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    return (
        math.floor(g1 * 1_000_000.0),
        math.floor(g2 * 1_000_000.0),
    )


def test_moment_profile_brute_force_random(spark):
    rng = random.Random(7)
    values = [round(rng.uniform(0.01, 500.0), 2) for _ in range(400)]
    r = _profile(spark, values)["g"]
    skew, kurt = _brute_moments(values)
    assert r["n"] == 400
    assert r["skew_micro"] == skew
    assert r["kurtosis_micro"] == kurt


def test_moment_profile_symmetric_has_zero_skew(spark):
    # perfectly symmetric sample -> m3 is exactly 0 in integer cents
    values = [10.0, 20.0, 30.0, 40.0, 50.0]
    r = _profile(spark, values)["g"]
    assert r["skew_micro"] == 0
    assert r["mean_micro"] == 30_000_000


def test_moment_profile_right_tail_positive_skew(spark):
    values = [1.0] * 50 + [100.0]  # heavy right outlier
    r = _profile(spark, values)["g"]
    assert r["skew_micro"] > 0
    assert r["kurtosis_micro"] > 0  # leptokurtic


def test_moment_profile_constant_group_is_null(spark):
    r = _profile(spark, [5.0, 5.0, 5.0])["g"]
    assert r["skew_micro"] is None
    assert r["kurtosis_micro"] is None
    assert r["mean_micro"] == 5_000_000


def test_moment_profile_singleton_is_null(spark):
    r = _profile(spark, [9.99])["g"]
    assert r["n"] == 1
    assert r["skew_micro"] is None


def _attribution(spark, rows, which):
    """rows: (event_id, user_id, ts_sec, event_type, value, props)."""
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )
    import os
    import tempfile

    df = spark.createDataFrame(
        [
            (eid, uid, float(ts), et, float(v), p)
            for (eid, uid, ts, et, v, p) in rows
        ],
        "event_id bigint, user_id bigint, __t double, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("__t").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    tmp = tempfile.mkdtemp(prefix="attr_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = {
        r["campaign"]: (r["n_purchases"], r["attributed_revenue"])
        for r in QUERIES[which](spark, tmp).collect()
    }
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return out


def test_first_vs_last_touch_disagree_on_two_campaigns(spark):
    rows = [
        # user 1: click k=1, click k=2, purchase -> first credits 1,
        # last credits 2
        (1, 1, 100, "click", 0.0, '{"k": 1}'),
        (2, 1, 200, "click", 0.0, '{"k": 2}'),
        (3, 1, 300, "purchase", 50.0, "{}"),
        # user 2: purchase with no prior click -> NULL in both
        (4, 2, 100, "purchase", 7.0, "{}"),
    ]
    first = _attribution(spark, rows, "first_touch_attribution")
    last = _attribution(spark, rows, "last_touch_attribution")
    assert first[1] == (1, 50.0) and 2 not in first
    assert last[2] == (1, 50.0) and 1 not in last
    assert first[None] == (1, 7.0) and last[None] == (1, 7.0)


def test_first_touch_click_after_purchase_not_credited(spark):
    rows = [
        (1, 1, 200, "purchase", 10.0, "{}"),
        (2, 1, 300, "click", 0.0, '{"k": 9}'),
    ]
    first = _attribution(spark, rows, "first_touch_attribution")
    assert first == {None: (1, 10.0)}


def test_activity_grid_shares_and_bounds(spark):
    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )

    rows = QUERIES["activity_grid"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= 168
    total = sum(r["n_events"] for r in rows)
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
        assert r["share_micro"] == r["n_events"] * 1_000_000 // total
    # shares sum to ~1e6 (floor rounding loses < |cells|)
    s = sum(r["share_micro"] for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000

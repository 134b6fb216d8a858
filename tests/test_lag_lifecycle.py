"""conversion_lag / new_vs_returning batch."""

from __future__ import annotations

import math
import os
import random
import shutil
import tempfile


def _run(spark, rows, which):
    """rows: (event_id, user_id, ts_sec, event_type, value, props)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )

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
    tmp = tempfile.mkdtemp(prefix="lag_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = QUERIES[which](spark, tmp).collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def test_conversion_lag_brute_force(spark):
    rng = random.Random(19)
    rows, eid = [], 0
    expected = {}  # campaign -> list of lag seconds
    for uid in range(30):
        t = 1000.0
        last_click = None
        for _ in range(rng.randrange(2, 8)):
            t += rng.randrange(1, 500)
            eid += 1
            if rng.random() < 0.5:
                camp = rng.randrange(1, 4)
                rows.append((eid, uid, t, "click", 0.0, '{"k": %d}' % camp))
                last_click = (t, camp)
            else:
                rows.append((eid, uid, t, "purchase", 1.0, "{}"))
                if last_click is not None:
                    cts, camp = last_click
                    expected.setdefault(camp, []).append(t - cts)
    out = {r["campaign"]: r for r in _run(spark, rows, "conversion_lag")}
    assert set(out) == set(expected)
    for camp, lags in expected.items():
        r = out[camp]
        lags_us = [int(v * 1_000_000) for v in lags]
        n = len(lags_us)
        assert r["n_conversions"] == n
        assert r["mean_lag_us"] == sum(lags_us) // n
        secs = sorted(u // 1_000_000 for u in lags_us)
        assert r["p50_lag_s"] == secs[math.ceil(n * 50 / 100) - 1]
        assert r["p90_lag_s"] == secs[math.ceil(n * 90 / 100) - 1]


def test_conversion_lag_uses_last_click_not_first(spark):
    rows = [
        (1, 1, 100.0, "click", 0.0, '{"k": 1}'),
        (2, 1, 400.0, "click", 0.0, '{"k": 2}'),
        (3, 1, 500.0, "purchase", 1.0, "{}"),
    ]
    out = {r["campaign"]: r for r in _run(spark, rows, "conversion_lag")}
    assert set(out) == {2}  # last click's campaign, 100s lag
    assert out[2]["mean_lag_us"] == 100_000_000
    assert out[2]["p50_lag_s"] == 100


def test_conversion_lag_unattributed_excluded(spark):
    rows = [(1, 1, 100.0, "purchase", 1.0, "{}")]
    assert _run(spark, rows, "conversion_lag") == []


def test_new_vs_returning_brute_force(spark):
    day = 86400.0
    rows = [
        # user 1 active on days 0 and 2; user 2 only day 2
        (1, 1, 0.5 * day, "view", 0.0, "{}"),
        (2, 1, 0.6 * day, "click", 0.0, "{}"),
        (3, 1, 2.5 * day, "view", 0.0, "{}"),
        (4, 2, 2.1 * day, "view", 0.0, "{}"),
    ]
    out = {r["day"]: r for r in _run(spark, rows, "new_vs_returning")}
    assert out[0]["n_users"] == 1 and out[0]["n_new"] == 1
    assert out[0]["new_share_micro"] == 1_000_000
    assert out[2]["n_users"] == 2 and out[2]["n_new"] == 1
    assert out[2]["n_returning"] == 1
    assert out[2]["new_share_micro"] == 500_000


def test_new_vs_returning_user_new_exactly_once(spark):
    rng = random.Random(23)
    day = 86400.0
    rows = []
    eid = 0
    for uid in range(40):
        for _ in range(rng.randrange(1, 6)):
            eid += 1
            rows.append(
                (eid, uid, rng.randrange(0, 10) * day + 100, "view", 0.0, "{}")
            )
    out = _run(spark, rows, "new_vs_returning")
    assert sum(r["n_new"] for r in out) == 40  # each user new exactly once
    assert all(r["n_users"] == r["n_new"] + r["n_returning"] for r in out)

"""Engagement-streaks + join-pricing batch."""

from __future__ import annotations

import datetime as dt

import pytest


def test_activity_streaks_islands(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        activity_streaks,
    )

    base = dt.datetime(2026, 1, 1, 12)
    # user 1 active on days 0,1,2, 5,6, 10 -> streaks 3,2,1;
    # two events on day 1 must not double-count the day
    days = [0, 1, 1, 2, 5, 6, 10]
    rows = [
        (i, 1, base + dt.timedelta(days=d, minutes=i))
        for i, d in enumerate(days)
    ]
    # user 2: single day
    rows.append((99, 2, base))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["entity"]: r for r in activity_streaks(df).collect()}
    u1 = got[1]
    assert (u1["n_streaks"], u1["n_active_days"]) == (3, 6)
    assert u1["longest_streak"] == 3
    assert u1["latest_streak"] == 1  # the day-10 island
    u2 = got[2]
    assert (u2["longest_streak"], u2["latest_streak"]) == (1, 1)


def test_activity_streaks_latest_is_end_anchored(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        activity_streaks,
    )

    base = dt.datetime(2026, 1, 1)
    # short island FIRST, long island LAST: latest must be the last one
    days = [0, 3, 4, 5, 6]
    rows = [
        (i, 1, base + dt.timedelta(days=d)) for i, d in enumerate(days)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = activity_streaks(df).collect()[0]
    assert got["longest_streak"] == 4 and got["latest_streak"] == 4


def test_join_size_estimate_exact_products(spark):
    from dane_visual_feature_extraction_worker_spark.operators.joins import (
        join_size_estimate,
    )

    left = spark.createDataFrame(
        [(k,) for k in ["a"] * 3 + ["b"] * 2 + ["c"]], "k string"
    )
    right = spark.createDataFrame(
        [(k,) for k in ["a"] * 4 + ["b"] * 1 + ["d"] * 5], "k string"
    )
    got = {
        r["key"]: r
        for r in join_size_estimate(left, right, "k", "k", k=5).collect()
    }
    # matched keys: a (3*4=12), b (2*1=2); c/d unmatched
    assert int(got["a"]["pairs"]) == 12
    assert int(got["b"]["pairs"]) == 2
    assert "c" not in got and "d" not in got
    tot = got["__total__"]
    assert int(tot["pairs"]) == 14
    assert tot["c_right"] == 2  # matched-key count rides the total row
    assert got["a"]["share_micro"] == 12 * 1_000_000 // 14
    # verified against the executed join
    real = left.join(right, "k").count()
    assert real == 14
    with pytest.raises(ValueError):
        join_size_estimate(left, right, "k", "k", k=0)

"""activity_bitmap / target_encode_loo batch."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


DAY0 = dt.datetime(2024, 1, 1)  # epoch day 19723


def _bm(spark, day_offsets_by_user, horizon=31):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        activity_bitmap,
    )

    rows = [
        (u, DAY0 + dt.timedelta(days=o, hours=3))
        for u, offs in day_offsets_by_user.items()
        for o in offs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    return {
        r["entity"]: r
        for r in activity_bitmap(
            df, epoch_day0=19723, horizon_days=horizon
        ).collect()
    }


def test_bitmap_basic_runs(spark):
    got = _bm(spark, {
        1: [0, 1, 2, 5, 6, 10],       # runs: 3, 2, 1
        2: [4],                        # single day
        3: list(range(31)),            # full month
    })
    assert got[1]["active_days"] == 6
    assert got[1]["longest_streak"] == 3
    assert got[1]["n_runs"] == 3
    assert got[1]["day_mask"] == (0b111 | 0b11 << 5 | 1 << 10)
    assert got[2] ["longest_streak"] == 1 and got[2]["n_runs"] == 1
    assert got[3]["active_days"] == 31
    assert got[3]["longest_streak"] == 31 and got[3]["n_runs"] == 1


def test_bitmap_duplicate_days_collapse(spark):
    got = _bm(spark, {1: [3, 3, 3]})
    assert got[1]["active_days"] == 1


def test_bitmap_out_of_horizon_dropped(spark):
    got = _bm(spark, {1: [0, 40]})
    assert got[1]["active_days"] == 1


def test_bitmap_horizon_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        _bm(spark, {1: [0]}, horizon=63)


def test_loo_matches_brute(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        target_encode_loo,
    )

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
        (4, "b", 100.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, t string, value double")
    got = {
        r["event_id"]: r["enc_micro"]
        for r in target_encode_loo(
            df, "t", "value", ["event_id"], prior_weight=10
        ).collect()
    }
    gmean = (1000 + 2000 + 3000 + 10000) * 10000 // 4  # cents -> micro
    # row 1: (S_a - y1)*1e4 + 10*gmean over (3 - 1 + 10)
    e1 = ((6000 - 1000) * 10000 + 10 * gmean) // 12
    assert got[1] == e1
    # singleton category b: pure smoothed prior
    assert got[4] == (0 * 10000 + 10 * gmean) // 10 == gmean


def test_loo_removes_self_leak(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        target_encode_loo,
    )

    # two rows, same category, very different labels: each encodes
    # toward the OTHER's label, not its own
    rows = [(1, "a", 0.0), (2, "a", 100.0)]
    df = spark.createDataFrame(rows, "event_id long, t string, value double")
    got = {
        r["event_id"]: r["enc_micro"]
        for r in target_encode_loo(
            df, "t", "value", ["event_id"], prior_weight=0
        ).collect()
    }
    assert got[1] == 100_000_000  # sees only the other row's 100.00
    assert got[2] == 0

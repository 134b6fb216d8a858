"""resample_linear batch."""

from __future__ import annotations

import datetime as dt


def _resample(spark, rows, step=3600):
    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        resample_linear,
    )

    df = spark.createDataFrame(rows, "e long, ts timestamp, v double")
    return {
        r["tick"]: r["value_interp_cents"]
        for r in resample_linear(
            df, entity_col="e", ts_col="ts", value_col="v",
            step_seconds=step,
        ).collect()
    }


def _epoch(d):
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp())


def test_linear_midpoint(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    t1 = dt.datetime(2024, 1, 1, 1, 30)
    rows = [(1, t0, 10.0), (1, t1, 20.0)]
    got = _resample(spark, rows)
    tick = _epoch(dt.datetime(2024, 1, 1, 1))  # exactly halfway
    assert got == {tick: 1500}


def test_linear_on_observation_returns_it(spark):
    t0 = dt.datetime(2024, 1, 1, 1, 0)
    rows = [(1, dt.datetime(2024, 1, 1, 0, 30), 5.0), (1, t0, 7.0),
            (1, dt.datetime(2024, 1, 1, 1, 30), 9.0)]
    got = _resample(spark, rows)
    assert got[_epoch(t0)] == 700  # pt == tick -> exact observation


def test_linear_exact_slope(spark):
    # 100 cents/hour slope: tick at 1/4 of the segment
    t0 = dt.datetime(2024, 1, 1, 0, 45)
    t1 = dt.datetime(2024, 1, 1, 4, 45)   # 4h later, +4.00
    rows = [(1, t0, 1.0), (1, t1, 5.0)]
    got = _resample(spark, rows)
    for h in (1, 2, 3, 4):
        tick = _epoch(dt.datetime(2024, 1, 1, h))
        frac_us = tick - _epoch(t0)
        expect = 100 + (400 * frac_us) // (4 * 3600)
        assert got[tick] == expect


def test_linear_negative_slope_truncation(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    t1 = dt.datetime(2024, 1, 1, 2, 30)
    rows = [(1, t0, 10.0), (1, t1, 1.0)]  # -900 cents over 2h
    got = _resample(spark, rows)
    tick1 = _epoch(dt.datetime(2024, 1, 1, 1))
    # trunc-toward-zero of the negative delta term, matching DIV
    q = (-900 * 1800)
    expect = 1000 + (abs(q) // 7200) * (-1 if q < 0 else 1)
    assert got[tick1] == expect


def test_linear_short_span_empty(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 10), 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 50), 2.0)]
    assert _resample(spark, rows) == {}


def test_seasonal_naive_exact(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        seasonal_naive_error,
    )

    rows = [
        (1, 0, 100), (1, 7, 130), (1, 14, 100),   # errs +30, -30
        (1, 3, 500),                               # no pair
        (2, 7, 50),                                # no day 0
    ]
    df = spark.createDataFrame(rows, "e long, d long, v long")
    got = {
        r["entity"]: r
        for r in seasonal_naive_error(
            df, "e", "d", "v", season_days=7
        ).collect()
    }
    assert got[1]["n_pairs"] == 2
    assert got[1]["mae_micro"] == 30_000_000
    assert got[1]["bias_micro"] == 0
    assert got[1]["max_abs_err"] == 30
    assert 2 not in got  # nothing scorable


def test_seasonal_naive_negative_bias_truncation(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        seasonal_naive_error,
    )

    rows = [(1, 0, 100), (1, 7, 93), (1, 14, 86)]  # errs -7, -7
    df = spark.createDataFrame(rows, "e long, d long, v long")
    r = seasonal_naive_error(df, "e", "d", "v").first()
    assert r["bias_micro"] == -7_000_000
    assert r["mae_micro"] == 7_000_000


def test_seasonal_naive_guard(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        seasonal_naive_error,
    )

    df = spark.createDataFrame([(1, 0, 1)], "e long, d long, v long")
    with pytest.raises(ValueError):
        seasonal_naive_error(df, "e", "d", "v", season_days=0)

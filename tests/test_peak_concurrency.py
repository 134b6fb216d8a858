"""Sweep-line peak-concurrency batch."""

from __future__ import annotations

import datetime as dt

import pytest


def _iv(spark, spans):
    base = dt.datetime(2026, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=s),
            base + dt.timedelta(seconds=e),
        )
        for i, (s, e) in enumerate(spans)
    ]
    return spark.createDataFrame(
        rows, "entity long, start_ts timestamp, end_ts timestamp"
    )


def test_peak_concurrency_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        peak_concurrency,
    )

    spans = [(0, 10), (5, 15), (8, 9), (20, 30), (25, 26), (40, 41)]
    got = peak_concurrency(_iv(spark, spans)).collect()[0]
    # brute force at 1s grid (ends inclusive)
    peak = max(
        sum(1 for s, e in spans if s <= t <= e) for t in range(0, 45)
    )
    assert got["peak"] == peak == 3
    assert got["n_intervals"] == 6
    # first instant of depth 3 is t=8
    assert got["peak_ts"] == dt.datetime(2026, 1, 1, 0, 0, 8)


def test_peak_concurrency_back_to_back_not_double_counted(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        peak_concurrency,
    )

    # [0,10] and [10,20] overlap AT t=10 (inclusive ends) -> peak 2;
    # [0,10] and [11,20] never overlap -> peak 1
    touching = peak_concurrency(_iv(spark, [(0, 10), (10, 20)])).collect()[0]
    assert touching["peak"] == 2
    apart = peak_concurrency(_iv(spark, [(0, 10), (11, 20)])).collect()[0]
    assert apart["peak"] == 1


def test_peak_concurrency_partition_independent_and_padded(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        peak_concurrency,
    )

    spans = [(i * 3, i * 3 + 2) for i in range(40)]  # gaps of 1s
    df = _iv(spark, spans).repartition(7)
    got = peak_concurrency(df).collect()[0]
    assert got["peak"] == 1
    # pad 2s: each interval now reaches into the next -> peak 2
    padded = peak_concurrency(df, pad_seconds=2).collect()[0]
    assert padded["peak"] == 2
    with pytest.raises(ValueError):
        peak_concurrency(df, pad_seconds=-1)

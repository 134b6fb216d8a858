"""session_gap_sweep batch."""

from __future__ import annotations

import datetime as dt

import pytest


def _sweep(spark, rows, gaps):
    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        session_gap_sweep,
    )

    df = spark.createDataFrame(rows, "e long, ts timestamp")
    return {
        r["gap_seconds"]: r
        for r in session_gap_sweep(
            df, gaps_seconds=gaps, entity_col="e", ts_col="ts"
        ).collect()
    }


def test_sweep_matches_brute(spark):
    t0 = dt.datetime(2024, 1, 1)
    # user 1: events at 0, 10m, 70m; user 2: 0, 5m
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=10)),
        (1, t0 + dt.timedelta(minutes=70)),
        (2, t0), (2, t0 + dt.timedelta(minutes=5)),
    ]
    got = _sweep(spark, rows, [900, 3600])
    # 15m threshold: user 1 splits at the 60m gap -> 3 sessions total
    assert got[900]["n_sessions"] == 3 and got[900]["n_splits"] == 1
    # covered time = total gaps (70m + 5m) minus the cut 60m gap = 15m
    assert got[900]["mean_session_span_us"] == 15 * 60 * 1_000_000 // 3
    # 1h threshold: nothing splits -> one session per user
    assert got[3600]["n_sessions"] == 2 and got[3600]["n_splits"] == 0
    assert got[3600]["mean_session_span_us"] == 75 * 60 * 1_000_000 // 2


def test_sweep_monotone_in_threshold(spark):
    import random

    t0 = dt.datetime(2024, 1, 1)
    rng = random.Random(9)
    rows = []
    for e in range(5):
        t = t0
        for _ in range(30):
            t += dt.timedelta(seconds=rng.randrange(10, 7000))
            rows.append((e, t))
    got = _sweep(spark, rows, [60, 600, 1800, 7200])
    counts = [got[g]["n_sessions"] for g in (60, 600, 1800, 7200)]
    assert counts == sorted(counts, reverse=True)  # bigger gap, fewer
    assert got[7200]["n_sessions"] == 5  # nothing splits past max gap


def test_sweep_validation(spark):
    with pytest.raises(ValueError):
        _sweep(spark, [(1, dt.datetime(2024, 1, 1))], [])
    with pytest.raises(ValueError):
        _sweep(spark, [(1, dt.datetime(2024, 1, 1))], [0])

"""theil_sen_trend / cold_start_report batch."""

from __future__ import annotations

import datetime as dt

import pytest


def _ts(spark, rows):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        theil_sen_trend,
    )

    df = spark.createDataFrame(rows, "e long, x long, y long")
    return {
        r["entity"]: (r["n_points"], r["n_pairs"], r["slope_micro"])
        for r in theil_sen_trend(
            df, entity_col="e", x_col="x", y_col="y"
        ).collect()
    }


def _trunc_div(a, b):
    """Truncate-toward-zero division (Spark DIV / DuckDB // semantics;
    Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _brute(points):
    slopes = sorted(
        _trunc_div((y2 - y1) * 1_000_000, x2 - x1)
        for i, (x1, y1) in enumerate(points)
        for (x2, y2) in points[i + 1:]
    )
    n = len(slopes)
    return slopes[(n + 1) // 2 - 1]


def test_theil_sen_exact_line(spark):
    rows = [(1, x, 300 * x + 7) for x in range(10)]
    got = _ts(spark, rows)
    assert got[1] == (10, 45, 300_000_000)


def test_theil_sen_outlier_robust(spark):
    pts = [(x, 100 * x) for x in range(9)] + [(9, 10_000_000)]
    rows = [(1, x, y) for x, y in pts]
    got = _ts(spark, rows)
    # OLS would be dragged far above 100 by the outlier day
    assert got[1][2] == 100_000_000


def test_theil_sen_negative_slope_matches_brute(spark):
    pts = [(0, 1000), (1, 300), (2, 50), (5, -400)]
    rows = [(1, x, y) for x, y in pts]
    got = _ts(spark, rows)
    assert got[1][2] == _brute(pts)
    assert got[1][2] < 0


def test_theil_sen_guard_raises(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        theil_sen_trend,
    )
    from py4j.protocol import Py4JJavaError

    rows = [(1, x, x) for x in range(30)]
    df = spark.createDataFrame(rows, "e long, x long, y long")
    with pytest.raises(Exception) as ei:
        theil_sen_trend(df, "e", "x", "y", max_points=10).collect()
    assert "max_points" in str(ei.value)


def test_cold_start_basic(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        cold_start_report,
    )

    split = dt.datetime(2024, 1, 10)
    pre, post = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 15)
    rows = (
        [(1, pre), (1, post), (1, post)]     # warm, 2 post events
        + [(2, post)]                        # cold, 1 post event
        + [(3, pre)]                         # pre-only: excluded
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = cold_start_report(df, split_ts="2024-01-10 00:00:00").first()
    assert r["n_entities_post"] == 2
    assert r["n_cold_entities"] == 1
    assert r["cold_entity_share_micro"] == 500_000
    assert r["n_events_post"] == 3
    assert r["n_events_cold"] == 1
    assert r["cold_event_share_micro"] == 333_333


def test_cold_start_boundary_is_post(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        cold_start_report,
    )

    at = dt.datetime(2024, 1, 10)
    df = spark.createDataFrame([(1, at)], "user_id long, ts timestamp")
    r = cold_start_report(df, split_ts="2024-01-10 00:00:00").first()
    # first event exactly at the split: entity is post-active AND cold
    assert r["n_entities_post"] == 1 and r["n_cold_entities"] == 1

"""Event-time disorder batch: watermark planning + inversion counts."""

from __future__ import annotations

import datetime as dt


def _mk(spark, seq_ts):
    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, s, base + dt.timedelta(seconds=t)) for s, t in seq_ts
    ]
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx long, ts timestamp"
    )


def test_disorder_audit_late_and_max(spark):
    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        disorder_audit,
    )

    # arrival order 0..4, event times: 10, 50, 20, 60, 55
    df = _mk(spark, [(0, 10), (1, 50), (2, 20), (3, 60), (4, 55)])
    got = disorder_audit(df).collect()[0]
    # late: t=20 (behind 50) and t=55 (behind 60) -> 2
    assert (got["n_events"], got["n_late"]) == (5, 2)
    assert got["late_micro"] == 2 * 1_000_000 // 5
    # worst regression: 50-20 = 30s = 30e6 us (the watermark bound)
    assert got["max_disorder_us"] == 30 * 1_000_000


def test_disorder_audit_in_order_is_clean(spark):
    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        disorder_audit,
    )

    df = _mk(spark, [(i, i * 10) for i in range(6)])
    got = disorder_audit(df).collect()[0]
    assert got["n_late"] == 0 and got["max_disorder_us"] is None


def test_order_inversions_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        order_inversions,
    )

    times = [10, 50, 20, 60, 55]
    df = _mk(spark, list(zip(range(5), times)))
    inv = sum(
        1
        for i in range(5)
        for j in range(i + 1, 5)
        if times[i] > times[j]
    )
    got = order_inversions(df).collect()[0]
    assert got["inversions"] == inv == 2
    assert got["inversion_micro"] == inv * 1_000_000 // (5 * 4 // 2)
    # reversed times -> maximal inversions
    dfr = _mk(spark, list(zip(range(4), [40, 30, 20, 10])))
    gr = order_inversions(dfr).collect()[0]
    assert gr["inversions"] == 6 and gr["inversion_micro"] == 1_000_000


def test_order_inversions_single_event(spark):
    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        order_inversions,
    )

    got = order_inversions(_mk(spark, [(0, 5)])).collect()[0]
    assert (got["inversions"], got["inversion_micro"]) == (0, 0)

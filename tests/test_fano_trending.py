"""Burstiness + trending batch."""

from __future__ import annotations

import datetime as dt

import pytest


def test_fano_burstiness_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        fano_burstiness,
    )

    base = dt.datetime(2026, 1, 1)
    # user 1: daily counts [1, 4, 1] -> mean 2, var (1+4+1... )
    counts = {0: 1, 1: 4, 2: 1}
    rows = []
    eid = 0
    for d, n in counts.items():
        for _ in range(n):
            rows.append((eid, 1, base + dt.timedelta(days=d, minutes=eid)))
            eid += 1
    # user 2: perfectly steady 2/day -> fano exactly 0
    for d in range(3):
        for _ in range(2):
            rows.append((eid, 2, base + dt.timedelta(days=d, minutes=eid)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["entity"]: r for r in fano_burstiness(df).collect()}
    xs = list(counts.values())
    n, s, sx2 = len(xs), sum(xs), sum(x * x for x in xs)
    assert got[1]["fano_micro"] == (n * sx2 - s * s) * 1_000_000 // (n * s)
    assert (got[1]["n_days"], got[1]["n_events"]) == (3, 6)
    assert got[2]["fano_micro"] == 0


def test_trending_report_ranks_and_entrant(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        trending_report,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0

    def add(cat, n, half):
        nonlocal eid
        for _ in range(n):
            rows.append(
                (
                    eid,
                    cat,
                    base + dt.timedelta(hours=0 if half == 1 else 100,
                                        seconds=eid),
                )
            )
            eid += 1

    add("falling", 10, 1); add("falling", 1, 2)
    add("rising", 2, 1);  add("rising", 9, 2)
    add("new", 0, 1);     add("new", 5, 2)
    # pin the time range so the cut splits at hour 50
    rows.append((eid, "anchor", base)); eid += 1
    rows.append((eid, "anchor", base + dt.timedelta(hours=100)))
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {r["category"]: r for r in trending_report(df, k=10).collect()}
    assert got["falling"]["rank_before"] == 1
    assert got["rising"]["rank_after"] == 1
    assert got["new"]["rank_before"] is None  # the entrant signal
    assert got["new"]["rank_delta"] is None
    assert got["rising"]["rank_delta"] > 0  # improved rank
    assert got["falling"]["rank_delta"] < 0
    with pytest.raises(ValueError):
        trending_report(df, k=0)

"""Scrub-verification + time-to-k batch."""

from __future__ import annotations

import datetime as dt

import pytest


def test_scrub_verification_removes_all(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        scrub_verification,
    )

    rows = [
        (1, "mail me at a.b@example.com or c@d.org", "s"),
        (2, "card 1234567890123456 and pin 9999999", "s"),
        (3, "clean text", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["pattern"]: r for r in scrub_verification(df).collect()}
    em = got["email"]
    assert (em["hits_before"], em["hits_after"]) == (2, 0)
    assert em["removed_micro"] == 1_000_000
    ln = got["longnum"]
    assert (ln["hits_before"], ln["hits_after"]) == (2, 0)
    # pattern with zero hits -> NULL removal share (no 0/0)
    gotz = {
        r["pattern"]: r
        for r in scrub_verification(
            df, patterns={"zzz": "zzz[0-9]{9}"}
        ).collect()
    }
    assert gotz["zzz"]["removed_micro"] is None
    with pytest.raises(ValueError):
        scrub_verification(df, patterns={})


def test_scrub_verification_detects_leaky_scrubber(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        scrub_verification,
    )

    # replacement text itself matching the pattern -> residual hits
    df = spark.createDataFrame(
        [(1, "secret 123456789", "s")], "doc_id long, text string, source string"
    )
    got = scrub_verification(
        df, patterns={"num": "[0-9]{6,}"}, replacement="0000000"
    ).collect()[0]
    assert got["hits_after"] > 0  # the gate catches the bad scrubber
    assert got["removed_micro"] < 1_000_000


def test_time_to_k_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        time_to_k,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: 5 events at 0, 10, 20, 30, 100s -> us_to_k = 100s
    for i, s in enumerate([0, 10, 20, 30, 100]):
        rows.append((i, 1, base + dt.timedelta(seconds=s)))
    # user 2: only 3 events -> not reached
    for i, s in enumerate([0, 5, 9]):
        rows.append((100 + i, 2, base + dt.timedelta(seconds=s)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["entity"]: r for r in time_to_k(df, k=5).collect()}
    assert got[1]["reached_k"] and got[1]["us_to_k"] == 100 * 1_000_000
    assert not got[2]["reached_k"] and got[2]["us_to_k"] is None
    with pytest.raises(ValueError):
        time_to_k(df, k=1)

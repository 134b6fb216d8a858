"""Watermark-pricing + length-grid batch."""

from __future__ import annotations

import datetime as dt

import pytest


def test_watermark_sweep_drop_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        watermark_sweep,
    )

    base = dt.datetime(2026, 1, 1)
    # arrival 0..4 with event times (s): 0, 100, 40, 200, 195
    rows = [
        (1, 0, base),
        (1, 1, base + dt.timedelta(seconds=100)),
        (1, 2, base + dt.timedelta(seconds=40)),    # 60s late
        (1, 3, base + dt.timedelta(seconds=200)),
        (1, 4, base + dt.timedelta(seconds=195)),   # 5s late
    ]
    df = spark.createDataFrame(rows, "conv_id long, turn_idx long, ts timestamp")
    got = {
        r["delay_s"]: r
        for r in watermark_sweep(df, delays_seconds=(0, 10, 60)).collect()
    }
    # D=0 drops both late events; D=10 drops only the 60s one;
    # D=60 drops none (lateness must EXCEED the delay)
    assert got[0]["n_dropped"] == 2
    assert got[10]["n_dropped"] == 1
    assert got[60]["n_dropped"] == 0
    assert got[0]["drop_micro"] == 2 * 1_000_000 // 5
    with pytest.raises(ValueError):
        watermark_sweep(df, delays_seconds=())
    with pytest.raises(ValueError):
        watermark_sweep(df, delays_seconds=(-1,))


def test_len_by_lang_grid_buckets_and_shares(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        len_by_lang_grid,
    )

    rows = [
        (1, "x" * 50, "en"),    # bucket 0
        (2, "x" * 150, "en"),   # bucket 1
        (3, "x" * 150, "en"),   # bucket 1
        (4, "x" * 5000, "en"),  # capped at max_bucket
        (5, "x" * 10, "fr"),    # bucket 0
        (6, None, "fr"),        # null -> len 0 -> bucket 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["grp"], r["bucket"]): r
        for r in len_by_lang_grid(df, bucket_chars=100, max_bucket=3).collect()
    }
    assert got[("en", 0)]["n_docs"] == 1
    assert got[("en", 1)]["n_docs"] == 2
    assert got[("en", 3)]["n_docs"] == 1  # capped
    assert got[("en", 1)]["lang_share_micro"] == 2 * 1_000_000 // 4
    assert got[("fr", 0)]["n_docs"] == 2
    assert got[("fr", 0)]["lang_share_micro"] == 1_000_000
    with pytest.raises(ValueError):
        len_by_lang_grid(df, bucket_chars=0)

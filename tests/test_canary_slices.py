"""Memorization-audit + slice-gap batch."""

from __future__ import annotations

import pytest


def test_canary_scan_exact_occurrences(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import canary_scan

    rows = [
        (1, "the CANARY sits; canary canary!", "a"),
        (2, "no birds here", "a"),
        (3, None, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["canary"]: r
        for r in canary_scan(df, canaries=("canary", "missing-xyz")).collect()
    }
    c = got["canary"]
    # case-insensitive: 3 occurrences in doc 1 only
    assert (c["n_docs"], c["docs_hit"], c["occurrences"]) == (3, 1, 3)
    assert c["hit_doc_micro"] == 1 * 1_000_000 // 3
    m = got["missing-xyz"]
    assert (m["docs_hit"], m["occurrences"]) == (0, 0)
    with pytest.raises(ValueError):
        canary_scan(df, canaries=())
    with pytest.raises(ValueError):
        canary_scan(df, canaries=("ok", ""))


def test_canary_scan_non_overlapping_replace_semantics(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import canary_scan

    # "aaaa" contains 2 NON-overlapping "aa" (replace semantics),
    # not 3 (sliding-window semantics) — the documented contract
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    got = canary_scan(df, canaries=("aa",)).collect()[0]
    assert got["occurrences"] == 2


def test_slice_gap_report(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        slice_gap_report,
    )

    rows = [
        ("en", True), ("en", True), ("en", False), ("en", True),  # 75%
        ("fr", True), ("fr", False),                               # 50%
        ("de", True),                                              # 100%
    ]
    df = spark.createDataFrame(rows, "slice string, correct boolean")
    got = {r["slice"]: r for r in slice_gap_report(df).collect()}
    assert got["en"]["acc_micro"] == 3 * 1_000_000 // 4
    assert got["fr"]["acc_micro"] == 500_000
    assert got["de"]["acc_micro"] == 1_000_000
    gap = got["__gap__"]
    assert gap["acc_micro"] == 1_000_000 - 500_000
    assert (gap["n"], gap["n_correct"]) == (7, 5)

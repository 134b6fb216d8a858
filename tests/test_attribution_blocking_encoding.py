"""linear_attribution / blocking_quality / encoding_audit batch."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    # rows: (user, minutes_offset, type, value, campaign)
    data = [
        (u, T0 + dt.timedelta(minutes=m), t, float(v), c)
        for u, m, t, v, c in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string,"
        " value double, camp long"
    )


def _attr(spark, rows, lookback=3600):
    from dane_visual_feature_extraction_worker_spark.operators.funnel import (
        linear_attribution,
    )

    return {
        r["campaign"]: (r["n_touches"], r["credit_microcents"])
        for r in linear_attribution(
            _ev(spark, rows),
            campaign=F.col("camp"),
            lookback_seconds=lookback,
        ).collect()
    }


def test_attr_equal_split_two_touches(spark):
    rows = [
        (1, 0, "click", 0, 10),
        (1, 5, "click", 0, 20),
        (1, 10, "purchase", 8.00, None),
    ]
    got = _attr(spark, rows)
    # 800 cents split over 2 touches -> 400_000_000 microcents each
    assert got[10] == (1, 400_000_000)
    assert got[20] == (1, 400_000_000)
    assert None not in got


def test_attr_orphan_purchase_goes_null(spark):
    rows = [(1, 0, "purchase", 5.00, None), (1, 5, "click", 0, 10)]
    got = _attr(spark, rows)
    assert got[None] == (0, 500_000_000)  # full value, zero touches
    assert got[10] == (1, 0)              # later click earns nothing


def test_attr_lookback_excludes_old_touch(spark):
    rows = [
        (1, 0, "click", 0, 10),
        (1, 120, "click", 0, 20),            # 2h later
        (1, 150, "purchase", 6.00, None),    # only camp 20 in 1h window
    ]
    got = _attr(spark, rows, lookback=3600)
    assert got[10] == (1, 0)
    assert got[20] == (1, 600_000_000)


def test_attr_same_microsecond_in_neither_frame(spark):
    rows = [(1, 0, "click", 0, 10), (1, 0, "purchase", 4.00, None)]
    got = _attr(spark, rows)
    # the tied-timestamp click neither counts as a touch for the
    # purchase nor receives credit; the purchase is unattributed
    assert got[10] == (1, 0)
    assert got[None] == (0, 400_000_000)


def test_attr_flooring_leak_is_bounded(spark):
    rows = [
        (1, 0, "click", 0, 10),
        (1, 1, "click", 0, 20),
        (1, 2, "click", 0, 30),
        (1, 10, "purchase", 1.00, None),  # 100 cents / 3
    ]
    got = _attr(spark, rows)
    each = 100 * 1_000_000 // 3
    assert got[10] == (1, each)
    total = sum(v for _, v in got.values())
    assert 100_000_000 - 3 < total <= 100_000_000


def test_blocking_quality_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        blocking_quality,
    )

    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb"), (4, "bb"), (5, "cc")],
        "doc_id long, text string",
    )
    # truth pairs: (1,2), (3,4) -> 2; candidates catch (1,2) + junk (1,5)
    cand = spark.createDataFrame(
        [(1, 2), (1, 5)], "doc_a long, doc_b long"
    )
    r = blocking_quality(docs, cand).first()
    assert r["n_docs"] == 5 and r["all_pairs"] == 10
    assert r["n_candidates"] == 2
    assert r["n_truth_pairs"] == 2 and r["n_truth_found"] == 1
    assert r["reduction_ratio_micro"] == 800_000   # pruned 8 of 10
    assert r["pair_completeness_micro"] == 500_000  # found 1 of 2


def test_blocking_quality_perfect_blocker(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        blocking_quality,
    )

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = blocking_quality(docs, cand).first()
    assert r["pair_completeness_micro"] == 1_000_000


def test_encoding_audit_flags(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        encoding_audit,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "clean text"),
            ("s1", "bad moji Ã© here"),
            ("s1", "smart quote â€™ leak"),
            ("s2", "repl � char"),
            ("s2", "ctrl \x07 byte"),
            ("s2", None),
        ],
        "source string, text string",
    )
    got = {r["group"]: r for r in encoding_audit(docs).collect()}
    assert got["s1"]["n_mojibake"] == 2
    assert got["s1"]["n_replacement"] == 0
    assert got["s1"]["clean_share_micro"] == 333_333
    assert got["s2"]["n_replacement"] == 1
    assert got["s2"]["n_control"] == 1
    assert got["s2"]["n_docs"] == 3  # NULL text counts as a clean doc
    assert got["s2"]["clean_share_micro"] == 333_333

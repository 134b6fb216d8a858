"""Purge-audit + revision-distance + Welch batch."""

from __future__ import annotations

import datetime as dt
import math


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def test_forget_audit_counts_and_purge_semantics(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import forget_audit

    rows = [(i, uid) for i, uid in enumerate([1, 1, 2, 3, 3, 3, 4])]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    tomb = spark.createDataFrame([(1,), (3,), (99,)], "user_id long")
    got = forget_audit(df, tomb, entity_col="user_id").collect()[0]
    assert got["entities_requested"] == 3
    assert got["entities_purged"] == 2  # 99 never seen
    assert got["entities_not_found"] == 1
    assert got["rows_purged"] == 5  # 2 of user 1 + 3 of user 3
    assert got["rows_kept"] == 2
    assert got["purged_share_micro"] == 5 * 1_000_000 // 7
    # the audit's numbers match what an actual purge removes
    purged = df.join(tomb, "user_id", "left_anti")
    assert purged.count() == got["rows_kept"]
    assert purged.join(tomb, "user_id", "left_semi").count() == 0


def test_forget_audit_duplicate_tombstones_counted_once(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import forget_audit

    df = spark.createDataFrame([(1, 1), (2, 2)], "event_id long, user_id long")
    tomb = spark.createDataFrame([(1,), (1,), (1,)], "user_id long")
    got = forget_audit(df, tomb).collect()[0]
    assert got["entities_requested"] == 1
    assert got["rows_purged"] == 1


def test_revision_distance_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        revision_distance,
    )

    base = dt.datetime(2026, 1, 1)
    texts = {
        "c1": ["hello world", "hello world", "hello w0rld!", "totally new"],
        "c2": ["single turn only"],
        "c3": ["", "abc"],
    }
    rows = []
    for conv, ts_list in texts.items():
        for i, t in enumerate(ts_list):
            rows.append((conv, base + dt.timedelta(minutes=i), i, t))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, turn_idx int, text string")
    got = {r["entity"]: r for r in revision_distance(df).collect()}
    # c2 has no adjacent pair at all
    assert "c2" not in got
    levs = [_lev(a, b) for a, b in zip(texts["c1"], texts["c1"][1:])]
    assert got["c1"]["n_pairs"] == 3
    assert got["c1"]["identical_n"] == sum(1 for x in levs if x == 0)
    assert got["c1"]["near_n"] == sum(1 for x in levs if 0 < x <= 5)
    assert got["c1"]["mean_lev_micro"] == sum(levs) * 1_000_000 // 3
    assert got["c1"]["max_lev"] == max(levs)
    assert got["c3"]["max_lev"] == 3  # '' -> 'abc'


def test_revision_distance_null_text_is_empty(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        revision_distance,
    )

    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c", base, 0, None), ("c", base + dt.timedelta(minutes=1), 1, "ab")],
        "conv_id string, ts timestamp, turn_idx int, text string",
    )
    got = revision_distance(df).collect()[0]
    assert (got["n_pairs"], got["max_lev"]) == (1, 2)


def test_welch_t_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        welch_t_report,
    )

    a = [10.0, 12.0, 11.5, 9.5, 13.0]
    b = [20.0, 18.0, 25.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("other", 99.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = welch_t_report(df, "grp", "value", "a", "b").collect()[0]
    assert (got["n_a"], got["n_b"]) == (5, 3)
    ma, mb = sum(a) / 5, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 4
    vb = sum((x - mb) ** 2 for x in b) / 2
    sea, seb = va / 5, vb / 3
    t = (ma - mb) / math.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (sea**2 / 4 + seb**2 / 2)
    assert abs(got["t_micro"] / 1e6 - t) < 1e-4
    assert abs(got["df_micro"] / 1e6 - dfw) < 1e-4
    assert got["mean_a_micro"] == int(sum(a) * 100) * 10000 // 5
    # 'other' group excluded entirely
    assert got["mean_b_micro"] == int(sum(b) * 100) * 10000 // 3


def test_welch_t_degenerate_group_nulls(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        welch_t_report,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "grp string, value double"
    )
    got = welch_t_report(df, "grp", "value", "a", "b").collect()[0]
    assert got["t_micro"] is None and got["df_micro"] is None
    assert (got["n_a"], got["n_b"]) == (2, 1)

"""turn_position_profile / role_latency_matrix / tool_loop_report."""

from __future__ import annotations

import os
import random
import shutil
import tempfile


def _run(spark, rows, which):
    """rows: (event_id, user_id, ts_sec, event_type, value, props)."""
    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark.plans.driver_queries import (
        QUERIES,
    )

    df = spark.createDataFrame(
        [
            (eid, uid, float(ts), et, float(v), p)
            for (eid, uid, ts, et, v, p) in rows
        ],
        "event_id bigint, user_id bigint, __t double, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("__t").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    tmp = tempfile.mkdtemp(prefix="seqqa_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = QUERIES[which](spark, tmp).collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def test_turn_position_profile_two_entities(spark):
    # 10 turns each, value == position index -> decile d has mean d
    rows = []
    eid = 0
    for uid in (1, 2):
        for i in range(10):
            eid += 1
            rows.append((eid, uid, 100.0 + i, "view", float(i), "ab"))
    out = {r["decile"]: r for r in _run(spark, rows, "turn_position_profile")}
    assert set(out) == set(range(10))
    for d, r in out.items():
        assert r["n_events"] == 2
        assert r["mean_value_micro"] == d * 1_000_000
        assert r["mean_props_len_micro"] == 2_000_000


def test_turn_position_profile_short_entity_skips_deciles(spark):
    # 3 turns: ranks 1,2,3 -> deciles 0, 3, 6
    rows = [(i, 1, 100.0 + i, "view", 1.0, "x") for i in range(1, 4)]
    out = {r["decile"]: r for r in _run(spark, rows, "turn_position_profile")}
    assert set(out) == {0, 3, 6}


def test_role_latency_matrix_brute_force(spark):
    rng = random.Random(31)
    rows, eid = [], 0
    expected = {}  # (from, to) -> [gaps_us]
    for uid in range(20):
        t = 1000.0
        prev = None
        for _ in range(rng.randrange(2, 7)):
            et = rng.choice(["a", "b", "c"])
            gap = rng.randrange(1, 100)
            t += gap
            eid += 1
            rows.append((eid, uid, t, et, 0.0, ""))
            if prev is not None:
                expected.setdefault((prev, et), []).append(
                    gap * 1_000_000
                )
            prev = et
    out = {
        (r["from_type"], r["to_type"]): r
        for r in _run(spark, rows, "role_latency_matrix")
    }
    assert set(out) == set(expected)
    for k, gaps in expected.items():
        assert out[k]["n_transitions"] == len(gaps)
        assert out[k]["mean_gap_us"] == sum(gaps) // len(gaps)


def test_tool_loop_report_detects_long_run(spark):
    seq = ["a", "a", "a", "a", "b", "a", "a", "b", "b"]
    rows = [
        (i, 1, 100.0 + i, et, 0.0, "") for i, et in enumerate(seq, 1)
    ]
    out = {r["event_type"]: r for r in _run(spark, rows, "tool_loop_report")}
    # runs: aaaa, b, aa, bb -> a: lens [4,2]; b: lens [1,2]
    assert out["a"]["n_runs"] == 2 and out["a"]["max_run_len"] == 4
    assert out["a"]["mean_run_len_micro"] == 3_000_000
    assert out["b"]["n_runs"] == 2 and out["b"]["max_run_len"] == 2
    assert out["b"]["mean_run_len_micro"] == 1_500_000


def test_tool_loop_report_runs_reset_across_entities(spark):
    # same type at the boundary of two users must NOT merge into one run
    rows = [
        (1, 1, 100.0, "a", 0.0, ""),
        (2, 1, 101.0, "a", 0.0, ""),
        (3, 2, 102.0, "a", 0.0, ""),
    ]
    out = {r["event_type"]: r for r in _run(spark, rows, "tool_loop_report")}
    assert out["a"]["n_runs"] == 2
    assert out["a"]["max_run_len"] == 2


def test_tool_loop_report_brute_force_random(spark):
    rng = random.Random(41)
    rows = [
        (i, rng.randrange(5), 100.0 + i, rng.choice("ab"), 0.0, "")
        for i in range(1, 200)
    ]
    out = {r["event_type"]: r for r in _run(spark, rows, "tool_loop_report")}
    # brute-force runs per (user, adjacency) from the generated order
    runs = {}  # type -> list of lengths
    by_user = {}
    for eid, uid, ts, et, _v, _p in sorted(rows, key=lambda x: (x[1], x[2], x[0])):
        by_user.setdefault(uid, []).append(et)
    for seq in by_user.values():
        i = 0
        while i < len(seq):
            j = i
            while j < len(seq) and seq[j] == seq[i]:
                j += 1
            runs.setdefault(seq[i], []).append(j - i)
            i = j
    for et, lens in runs.items():
        r = out[et]
        assert r["n_runs"] == len(lens)
        assert r["max_run_len"] == max(lens)
        assert (
            r["mean_run_len_micro"]
            == sum(lens) * 1_000_000 // len(lens)
        )


def test_copypasta_report_cross_user_only(spark):
    rows = [
        # "dup" posted by users 1,2 (3 events) -> reported
        (1, 1, 100.0, "view", 0.0, "dup"),
        (2, 1, 101.0, "view", 0.0, "dup"),
        (3, 2, 102.0, "view", 0.0, "dup"),
        # "solo" posted 5x by ONE user -> retry noise, excluded
        *[(10 + i, 3, 110.0 + i, "view", 0.0, "solo") for i in range(5)],
        # empty props never enter
        (20, 4, 120.0, "view", 0.0, ""),
        (21, 5, 121.0, "view", 0.0, ""),
    ]
    out = _run(spark, rows, "copypasta_report")
    assert len(out) == 1
    r = out[0]
    assert r["n_users"] == 2 and r["n_events"] == 3


def test_copypasta_report_ordering_and_limit(spark):
    rows = []
    eid = 0
    # text t_k shared by k+2 users, k = 0..24 -> 25 candidates, top-20
    # must be the highest-spread ones in (n_users desc) order
    for k in range(25):
        for uid in range(k + 2):
            eid += 1
            rows.append((eid, 1000 * k + uid, 100.0 + eid, "view", 0.0, f"t_{k}"))
    out = _run(spark, rows, "copypasta_report")
    assert len(out) == 20
    spreads = [r["n_users"] for r in out]
    assert spreads == sorted(spreads, reverse=True)
    assert spreads[0] == 26 and spreads[-1] == 7  # k=24 .. k=5 survive


def test_session_bounce_report_known_sessions(spark):
    # user 1: events at t=0,10 (one 2-deep session), then t=10000 (bounce)
    # user 2: single event (bounce)
    rows = [
        (1, 1, 0.0, "view", 0.0, ""),
        (2, 1, 10.0, "view", 0.0, ""),
        (3, 1, 10000.0, "view", 0.0, ""),
        (4, 2, 50.0, "view", 0.0, ""),
    ]
    r = _run(spark, rows, "session_bounce_report")[0]
    assert r["n_sessions"] == 3
    assert r["n_bounce"] == 2
    assert r["bounce_rate_micro"] == 2 * 1_000_000 // 3
    assert r["mean_depth_micro"] == 4 * 1_000_000 // 3
    assert r["max_depth"] == 2


def test_session_bounce_report_gap_boundary(spark):
    # gap of exactly 3600s does NOT start a new session (> cut, not >=)
    rows = [
        (1, 1, 0.0, "view", 0.0, ""),
        (2, 1, 3600.0, "view", 0.0, ""),
        (3, 1, 7201.0, "view", 0.0, ""),  # 3601s after -> new session
    ]
    r = _run(spark, rows, "session_bounce_report")[0]
    assert r["n_sessions"] == 2
    assert r["max_depth"] == 2


def test_dau_wau_stickiness_brute_force(spark):
    day = 86400.0
    # user 1 active days 0,1,8; user 2 active day 1; user 3 day 8
    rows = [
        (1, 1, 0.2 * day, "view", 0.0, ""),
        (2, 1, 1.3 * day, "view", 0.0, ""),
        (3, 1, 8.1 * day, "view", 0.0, ""),
        (4, 2, 1.6 * day, "view", 0.0, ""),
        (5, 3, 8.9 * day, "view", 0.0, ""),
    ]
    out = {r["day"]: r for r in _run(spark, rows, "dau_wau_stickiness")}
    assert set(out) == {0, 1, 8}
    # day 0: DAU {1}; WAU(trailing 7: days -6..0 -> only day 0) = {1}
    assert out[0]["dau"] == 1 and out[0]["wau"] == 1
    assert out[0]["stickiness_micro"] == 1_000_000
    assert out[0]["n_days_in_window"] == 1
    # day 1: DAU {1,2}; WAU days -5..1 = {1,2}
    assert out[1]["dau"] == 2 and out[1]["wau"] == 2
    # day 8: DAU {1,3}; WAU days 2..8 = {1,3}
    assert out[8]["dau"] == 2 and out[8]["wau"] == 2
    assert out[8]["n_days_in_window"] == 7


def test_dau_wau_wau_counts_user_once(spark):
    day = 86400.0
    # one user active every day 0-6: WAU at day 6 must be 1, not 7
    rows = [
        (i, 1, (i + 0.5) * day, "view", 0.0, "") for i in range(7)
    ]
    out = {r["day"]: r for r in _run(spark, rows, "dau_wau_stickiness")}
    assert out[6]["wau"] == 1 and out[6]["dau"] == 1
    assert out[6]["stickiness_micro"] == 1_000_000


def test_value_by_returning_detects_gap(spark):
    day = 86400.0
    rows = []
    eid = 0
    # 10 users: first-day events value 10, returning-day events value 30
    for uid in range(10):
        eid += 1
        rows.append((eid, uid, 0.3 * day + uid, "view", 10.0 + uid % 3, ""))
        eid += 1
        rows.append((eid, uid, 5.0 * day + uid, "view", 30.0 + uid % 3, ""))
    r = _run(spark, rows, "value_by_returning")[0]
    assert r["n_a"] == 10 and r["n_b"] == 10  # returning / first
    assert r["mean_a_micro"] - r["mean_b_micro"] == 20_000_000
    assert r["t_micro"] > 0

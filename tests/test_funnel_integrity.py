"""Event-sequence suite: ordered funnel, retention, decayed sum,
ordered digest — brute-force cross-checks + layout invariance."""

from __future__ import annotations

import datetime as dt
import hashlib
import random

import pyspark.sql.functions as F
import pytest

from dane_visual_feature_extraction_worker_spark.operators.funnel import (
    funnel_steps,
    retention_matrix,
)
from dane_visual_feature_extraction_worker_spark.operators.integrity import (
    ordered_digest,
)
from dane_visual_feature_extraction_worker_spark.operators.windows import (
    decayed_sum,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def events(spark):
    rng = random.Random(77)
    types = ["view", "click", "purchase", "error"]
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(0, 60)):
            rows.append(
                (
                    eid,
                    u,
                    T0 + dt.timedelta(seconds=rng.randint(0, 500_000)),
                    rng.choice(types),
                    round(rng.uniform(0, 500), 2),
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    df.cache().count()
    return df


def brute_funnel(rows, steps):
    """Python reference: first step k strictly after resolved step k-1."""
    rows = sorted(rows, key=lambda r: (r[2], r[0]))
    out = []
    prev = None
    for s in steps:
        t = None
        for r in rows:
            if r[3] == s and (prev is None or r[2] > prev):
                t = r[2]
                break
        out.append(t)
        if t is None:
            prev = dt.datetime.max  # chain broken: later steps unreachable
        else:
            prev = t
    return out


def test_funnel_matches_bruteforce(spark, events):
    steps = ("view", "click", "purchase")
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"], r["reached"])
        for r in funnel_steps(events, steps).collect()
    }
    by_user = {}
    for r in events.collect():
        by_user.setdefault(r["user_id"], []).append(
            (r["event_id"], r["user_id"], r["ts"], r["event_type"])
        )
    for u, rows in by_user.items():
        exp = brute_funnel(rows, steps)
        reached = sum(t is not None for t in exp)
        assert got[u] == (*exp, reached), f"user {u}"


def test_funnel_chain_break_leaves_nulls(spark):
    # purchase happens BEFORE the first click -> step 3 must be NULL
    rows = [
        (0, 1, T0 + dt.timedelta(seconds=10), "view", 1.0),
        (1, 1, T0 + dt.timedelta(seconds=20), "purchase", 1.0),
        (2, 1, T0 + dt.timedelta(seconds=30), "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    r = funnel_steps(df, ("view", "click", "purchase")).collect()[0]
    assert r["t_view"] is not None and r["t_click"] is not None
    assert r["t_purchase"] is None and r["reached"] == 2


def test_funnel_strict_inequality_same_ts(spark):
    # click at EXACTLY the first-view ts must not count (strict >)
    rows = [
        (0, 1, T0, "view", 1.0),
        (1, 1, T0, "click", 1.0),
        (2, 1, T0 + dt.timedelta(seconds=5), "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    r = funnel_steps(df, ("view", "click")).collect()[0]
    assert r["t_click"] == T0 + dt.timedelta(seconds=5)


def test_retention_matches_bruteforce(spark, events):
    got = {
        (r["cohort"], r["offset_days"]): r["n_entities"]
        for r in retention_matrix(events).collect()
    }
    rows = events.collect()
    first = {}
    for r in rows:
        d = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        if r["user_id"] not in first or d < first[r["user_id"]]:
            first[r["user_id"]] = d
    exp = {}
    for r in rows:
        c = first[r["user_id"]]
        d = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        exp.setdefault((c, (d - c).days), set()).add(r["user_id"])
    assert got == {k: len(v) for k, v in exp.items()}


def test_decayed_sum_exact_vs_python(spark, events):
    got = {
        (r["user_id"], r["event_id"]): r["decayed_value"]
        for r in decayed_sum(events, n_terms=16).collect()
    }
    by_user = {}
    for r in sorted(events.collect(), key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rows in by_user.items():
        cents = [round(r["value"] * 100) for r in rows]
        for i, r in enumerate(rows):
            exp = sum(
                cents[i - k] * 2.0**-k for k in range(min(16, i + 1))
            ) / 100.0
            assert got[(u, r["event_id"])] == exp  # bit-exact, not approx


def test_ordered_digest_layout_invariant(spark, events):
    base = {
        r["user_id"]: (r["n_turns"], r["digest"])
        for r in ordered_digest(events).collect()
    }
    # different physical layouts: single partition and 16-way scrambled
    for df in (events.coalesce(1), events.repartition(16, "event_id")):
        again = {
            r["user_id"]: (r["n_turns"], r["digest"])
            for r in ordered_digest(df).collect()
        }
        assert again == base


def test_ordered_digest_matches_hashlib(spark, events):
    got = {
        r["user_id"]: (r["n_turns"], r["digest"])
        for r in ordered_digest(events).collect()
    }
    by_user = {}
    for r in sorted(events.collect(), key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rows in by_user.items():
        payload = "\x1f".join(f"{r['event_id']}|{r['event_type']}" for r in rows)
        assert got[u] == (
            len(rows),
            hashlib.md5(payload.encode()).hexdigest(),
        )


def test_funnel_single_shuffle_plan(spark, events):
    """The funnel's groupBy reuses the window's hash partitioning —
    exactly ONE exchange in the whole plan."""
    plan = funnel_steps(events, ("view", "click", "purchase"))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan

"""Encoding + split operators: brute-force cross-checks, a temporal-
leakage perturbation test, and the session_features one-exchange
plan audit."""

from __future__ import annotations

import datetime as dt
import hashlib
import random

import numpy as np
import pyspark.sql.functions as F
import pytest

from dane_visual_feature_extraction_worker_spark.operators.encoding import (
    hashed_cross,
    standardize,
    target_encode_pit,
)
from dane_visual_feature_extraction_worker_spark.operators.sampling import (
    holdout_last_k,
)
from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
    session_features,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def events(spark):
    rng = random.Random(13)
    rows = []
    for eid in range(800):
        rows.append(
            (
                eid,
                rng.randrange(25),
                T0 + dt.timedelta(seconds=rng.randint(0, 400_000)),
                rng.choice(["view", "click", "purchase"]),
                round(rng.uniform(0, 300), 2),
            )
        )
    df = _mk(spark, rows)
    df.cache().count()
    return df


def test_target_encode_matches_bruteforce(spark, events):
    got = {
        r["event_id"]: (r["target_enc"], r["n_prior"])
        for r in target_encode_pit(events)
        .join(events.select("event_id", "ts", "event_id"), ["ts", "event_id"])
        .collect()
    }
    by_cat = {}
    for r in sorted(events.collect(), key=lambda r: (r["ts"], r["event_id"])):
        hist = by_cat.setdefault(r["event_type"], [])
        cents = [round(h["value"] * 100) for h in hist]
        exp = (sum(cents) / len(cents)) / 100.0 if cents else None
        assert got[r["event_id"]] == (exp, len(cents)), r["event_id"]
        hist.append(r)


def test_target_encode_no_temporal_leakage(spark, events):
    """Perturbing every target AFTER a cutoff must not move any
    encoding at-or-before the cutoff."""
    cut = T0 + dt.timedelta(seconds=200_000)
    perturbed = events.withColumn(
        "value",
        F.when(F.col("ts") > F.lit(cut), F.col("value") + 999.0).otherwise(
            F.col("value")
        ),
    )
    base = {
        (r["ts"], r["event_id"]): r["target_enc"]
        for r in target_encode_pit(events).collect()
        if r["ts"] <= cut
    }
    after = {
        (r["ts"], r["event_id"]): r["target_enc"]
        for r in target_encode_pit(perturbed).collect()
        if r["ts"] <= cut
    }
    assert base == after


def test_hashed_cross_matches_hashlib_and_range(spark, events):
    got = {
        r["event_id"]: r["cross_bucket"]
        for r in hashed_cross(
            events, cols=("event_type", "user_id"), n_buckets=64
        ).collect()
    }
    for r in events.collect():
        hx = hashlib.md5(
            f"{r['event_type']}|{r['user_id']}".encode()
        ).hexdigest()
        assert got[r["event_id"]] == int(hx[:8], 16) % 64
    assert all(0 <= b < 64 for b in got.values())


def test_holdout_last_k_split(spark, events):
    out = holdout_last_k(events, k=5).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rows in by_user.items():
        k = min(5, len(rows))
        assert [r["split"] for r in rows[-k:]] == ["eval"] * k
        assert all(r["split"] == "train" for r in rows[:-k])


def test_standardize_matches_numpy(spark, events):
    got = {r["event_id"]: r["z_value"] for r in standardize(events).collect()}
    vals = {r["event_id"]: round(r["value"] * 100) for r in events.collect()}
    c = np.array([vals[k] for k in sorted(vals)], dtype=np.float64)
    mean, std = c.mean(), c.std(ddof=1)
    for i, k in enumerate(sorted(vals)):
        exp = np.floor((c[i] - mean) / std * 1e6) / 1e6
        assert got[k] == pytest.approx(exp, abs=2e-6)


def test_session_features_consistency(spark, events):
    out = session_features(
        events, gap_seconds=3600.0, entity="user_id", order=["ts", "event_id"]
    ).collect()
    by_sess = {}
    for r in out:
        by_sess.setdefault((r["user_id"], r["session_id"]), []).append(r)
    for (_, _), rows in by_sess.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        assert [r["pos_in_session"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        n = rows[0]["session_n_turns"]
        assert all(r["session_n_turns"] == n for r in rows) and n == len(rows)
        dur = (rows[-1]["ts"] - rows[0]["ts"]).total_seconds()
        assert rows[0]["session_duration_s"] == pytest.approx(dur, abs=1e-5)
        # gap rule: intra-session gaps <= 3600 s
        for a, b in zip(rows, rows[1:]):
            assert (b["ts"] - a["ts"]).total_seconds() <= 3600.0


def test_session_features_single_exchange(spark, events):
    plan = (
        session_features(events, entity="user_id", order=["ts", "event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan

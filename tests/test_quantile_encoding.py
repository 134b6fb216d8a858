"""Quantile bucketize / freq encode / winsorize: numpy cross-checks,
tie-heavy boundary cases, zero-shuffle broadcast plan audits."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pytest

from dane_visual_feature_extraction_worker_spark.operators.encoding import (
    freq_encode,
    quantile_bucketize,
    winsorize,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)


def _mk(spark, values, types=None):
    rows = [
        (
            i,
            i % 7,
            T0 + dt.timedelta(seconds=i),
            (types[i] if types else "view"),
            v,
        )
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _disc_quantile(sorted_cents, q):
    """Inverse ECDF: smallest value with cumulative distribution >= q."""
    n = len(sorted_cents)
    for i, v in enumerate(sorted_cents, 1):
        if i / n >= q:
            return v
    return sorted_cents[-1]


@pytest.mark.parametrize("seed", [1, 2])
def test_quantile_bucketize_matches_python(spark, seed):
    rng = random.Random(seed)
    # tie-heavy: values drawn from a SMALL grid so quantiles land on ties
    vals = [round(rng.choice([1.0, 2.5, 2.5, 7.75, 10.0, 99.99]), 2) for _ in range(500)]
    df = _mk(spark, vals)
    got = {r["event_id"]: r["bucket"] for r in quantile_bucketize(df, n_buckets=10).collect()}
    cents = sorted(round(v * 100) for v in vals)
    ts = [_disc_quantile(cents, k / 10) for k in range(1, 10)]
    for i, v in enumerate(vals):
        c = round(v * 100)
        assert got[i] == sum(c > t for t in ts), (i, v)


def test_winsorize_matches_python(spark):
    rng = random.Random(9)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(400)]
    vals[0], vals[1] = 10_000.0, -10_000.0  # outliers that must clamp
    df = _mk(spark, vals)
    got = {r["event_id"]: r["value_winsor"] for r in winsorize(df, lower=0.01, upper=0.99).collect()}
    cents = sorted(round(v * 100) for v in vals)
    lo, hi = _disc_quantile(cents, 0.01), _disc_quantile(cents, 0.99)
    for i, v in enumerate(vals):
        c = min(max(round(v * 100), lo), hi)
        assert got[i] == c / 100.0
    assert got[0] == hi / 100.0 and got[1] == lo / 100.0


def test_freq_encode_counts_and_collapse(spark):
    types = ["a"] * 50 + ["b"] * 30 + ["c"] * 3
    df = _mk(spark, [1.0] * len(types), types=types)
    out = freq_encode(df, min_count=10).collect()
    by_id = {r["event_id"]: r for r in out}
    for i, t in enumerate(types):
        r = by_id[i]
        exp_cnt = {"a": 50, "b": 30, "c": 3}[t]
        assert r["cat_count"] == exp_cnt
        assert r["category"] == (t if exp_cnt >= 10 else "__other__")
        assert r["cat_share"] == exp_cnt / 83.0


def test_bucketize_no_corpus_shuffle(spark):
    """The big side must reach the output through broadcast only.
    The quantile ops have NO hash exchange at all (their stats agg is a
    global single-partition aggregate); freq_encode's one hash exchange
    is the domain-sized count rollup — the corpus itself must ride a
    BroadcastHashJoin, never a sort-merge exchange."""
    df = _mk(spark, [float(i) for i in range(100)])
    for op in (quantile_bucketize(df, n_buckets=4), winsorize(df)):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    plan = freq_encode(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    # the only hash exchange feeds the partial-count rollup
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_grouped_quantiles_matches_python(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        grouped_quantiles,
    )

    rng = random.Random(4)
    vals, types = [], []
    grid = [1.0, 2.5, 2.5, 7.75, 10.0]
    for _ in range(400):
        vals.append(round(rng.choice(grid), 2))
        types.append(rng.choice(["a", "b", "c"]))
    df = _mk(spark, vals, types=types)
    got = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in grouped_quantiles(df).collect()
    }
    by_t: dict[str, list] = {}
    for v, t in zip(vals, types):
        by_t.setdefault(t, []).append(round(v * 100))
    for t, cs in by_t.items():
        cs.sort()
        exp = tuple(_disc_quantile(cs, q) / 100.0 for q in (0.25, 0.5, 0.75, 0.9))
        assert got[t] == exp, (t, exp, got[t])


def test_grouped_quantiles_single_exchange(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        grouped_quantiles,
    )

    df = _mk(spark, [float(i) for i in range(50)])
    plan = (
        grouped_quantiles(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan

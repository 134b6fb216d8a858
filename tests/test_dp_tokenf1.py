"""DP-release + token-F1 batch."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest


def _key(salt, value):
    hx = hashlib.md5(f"{salt}|{value}".encode()).hexdigest()
    return int(hx[:8], 16)


def test_dp_histogram_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import dp_histogram

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    b_micro = 2_500_000  # b = 2.5
    got = {
        r["category"]: r
        for r in dp_histogram(
            df, category_col="event_type", eps_inv_micro=b_micro
        ).collect()
    }
    lnm = lambda v: math.floor(math.log(v) * 1e6)  # noqa: E731
    for cat, n in Counter(c for _, c in rows).items():
        u1 = _key("dp1", cat) + 1
        u2 = _key("dp2", cat) + 1
        d = lnm(u2) - lnm(u1)
        sign = 1 if d >= 0 else -1
        noise = sign * (b_micro * abs(d) // 1_000_000)
        r = got[cat]
        assert r["n_raw"] == n
        assert r["noise_micro"] == noise
        assert r["released_micro"] == n * 1_000_000 + noise
    with pytest.raises(ValueError):
        dp_histogram(df, eps_inv_micro=0)


def test_dp_histogram_noise_is_laplace_shaped(spark):
    """Sanity on the mechanism: over many categories the noise is
    symmetric around 0 and has mean |noise| ≈ b (Laplace(b) has
    E|X| = b)."""
    from dane_visual_feature_extraction_worker_spark.operators.dq import dp_histogram

    rows = [(i, f"cat{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    out = dp_histogram(df, eps_inv_micro=1_000_000).collect()
    noises = [r["noise_micro"] / 1e6 for r in out]
    n_pos = sum(1 for x in noises if x > 0)
    assert 0.4 < n_pos / len(noises) < 0.6
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert 0.8 < mean_abs < 1.2  # E|Laplace(1)| = 1


def test_token_f1_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        token_f1_eval,
    )

    rows = [
        (1, "the cat sat", "the cat sat"),         # exact -> 1
        (2, "the the cat", "the dog"),             # multiset overlap=1 ('the')
        (3, "a b c", "x y z"),                     # disjoint -> 0
        (4, None, "gold text"),                    # empty pred
    ]
    df = spark.createDataFrame(rows, "pair_id long, pred string, gold string")
    got = {r["pair_id"]: r for r in token_f1_eval(df).collect()}
    assert got[1]["f1_micro"] == 1_000_000
    # pair 2: pred bag {the:2, cat:1}, gold {the:1, dog:1} -> overlap 1
    assert got[2]["overlap"] == 1
    assert got[2]["f1_micro"] == 2 * 1 * 1_000_000 // (3 + 2)
    assert got[3]["f1_micro"] == 0
    assert (got[4]["n_pred"], got[4]["overlap"]) == (0, 0)
    # mean row keys on -1 and averages the floored micros
    mean = got[-1]
    per = [got[i]["f1_micro"] for i in (1, 2, 3, 4)]
    assert mean["f1_micro"] == sum(per) // 4
    assert mean["overlap"] == sum(got[i]["overlap"] for i in (1, 2, 3, 4))

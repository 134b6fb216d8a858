"""Eval-estimator batch: pass@k (Codex estimator), token bigram
conditional entropy rate."""

from __future__ import annotations

import math
import random
from collections import Counter
from math import comb

import pytest


def test_pass_at_k_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import pass_at_k

    random.seed(5)
    rows, truth = [], {}
    for t in range(40):
        n = random.randint(1, 12)
        c = random.randint(0, n)
        truth[t] = (n, c)
        rows.extend((t, i < c) for i in range(n))
    df = spark.createDataFrame(rows, "task_id long, correct boolean")
    for k in (1, 2, 5):
        got = {r["task"]: r for r in pass_at_k(df, k=k).collect()}
        for t, (n, c) in truth.items():
            r = got[t]
            if n < k:
                assert r["pass_micro"] is None and not r["estimable"]
            else:
                # exact rational, not float: (den-num)*1e6 // den
                num = comb(n - c, k) if n - c >= k else 0
                den = comb(n, k)
                assert r["pass_micro"] == (den - num) * 1_000_000 // den
                assert r["estimable"]


def test_pass_at_k_edges(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import pass_at_k

    rows = [
        # all correct -> pass = 1
        (1, True), (1, True), (1, True),
        # none correct -> pass = 0
        (2, False), (2, False),
        # fewer failures than k -> pass = 1 exactly
        (3, True), (3, True), (3, False),
    ]
    df = spark.createDataFrame(rows, "task_id long, correct boolean")
    got = {r["task"]: r["pass_micro"] for r in pass_at_k(df, k=2).collect()}
    assert got[1] == 1_000_000
    assert got[2] == 0
    assert got[3] == 1_000_000
    with pytest.raises(ValueError):
        pass_at_k(df, k=0)


def test_token_entropy_rate_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        token_entropy_rate,
    )

    rows = [
        (1, "a b a b a c", "s0"),
        (2, "b a c a", "s0"),
        (3, "x", "s0"),  # no bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # brute force with the same micro-nat flooring
    pairs = Counter()
    for _, text, _src in rows:
        t = text.split()
        for i in range(len(t) - 1):
            pairs[(t[i], t[i + 1])] += 1
    prev = Counter()
    for (p, _n), c in pairs.items():
        prev[p] += c
    lnm = lambda v: math.floor(math.log(v) * 1e6)  # noqa: E731
    s = sum(c * (lnm(prev[p]) - lnm(c)) for (p, _n), c in pairs.items())
    nb = sum(pairs.values())
    got = token_entropy_rate(df).collect()[0]
    assert got["n_bigrams"] == nb
    assert got["n_pairs"] == len(pairs)
    assert got["rate_micro_nat"] == s // nb


def test_token_entropy_deterministic_chain_is_zero(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        token_entropy_rate,
    )

    # every token deterministically follows its predecessor
    df = spark.createDataFrame(
        [(1, "a b c d a b c d", "loop"), (2, "a b c d", "loop")],
        "doc_id long, text string, source string",
    )
    got = token_entropy_rate(df).collect()[0]
    # H(next|prev)=0 except the branch a->b vs d->a; here d->a and
    # a->b are both deterministic, so the rate is exactly 0
    assert got["rate_micro_nat"] == 0

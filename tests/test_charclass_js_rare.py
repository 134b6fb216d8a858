"""Forty-ninth batch: character-class composition profile,
Jensen-Shannon unigram divergence, rare-category collapse."""

from __future__ import annotations

import math
from collections import Counter

import pytest


def test_charclass_profile_known_composition(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        charclass_profile,
    )

    # "ab12 !" -> 2 letters, 2 digits, 1 space, 1 punct of n=6
    # "éé" -> 2 chars, all 'other' (non-ASCII)
    docs = spark.createDataFrame(
        [("s0", "ab12 !"), ("s1", "éé"), ("s2", None)],
        "source string, text string",
    )
    got = {r["grp"]: r for r in charclass_profile(docs).collect()}
    r0 = got["s0"]
    assert r0["n_chars"] == 6
    assert r0["letter_micro"] == 2 * 1_000_000 // 6
    assert r0["digit_micro"] == 2 * 1_000_000 // 6
    assert r0["space_micro"] == 1 * 1_000_000 // 6
    assert r0["punct_micro"] == 1 * 1_000_000 // 6
    assert r0["other_micro"] == 0
    r1 = got["s1"]
    assert r1["n_chars"] == 2 and r1["other_micro"] == 1_000_000
    assert r1["letter_micro"] == 0
    # null text -> empty -> all zeros, no divide-by-zero
    r2 = got["s2"]
    assert r2["n_chars"] == 0 and r2["other_micro"] == 0


def test_charclass_shares_sum_to_one_minus_truncation(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        charclass_profile,
    )

    docs = spark.createDataFrame(
        [("g", "The 42 quick-brown foxes!! \t\n jumped over 7 lazy dogs?")],
        "source string, text string",
    )
    r = charclass_profile(docs).collect()[0]
    total = (
        r["letter_micro"]
        + r["digit_micro"]
        + r["space_micro"]
        + r["punct_micro"]
        + r["other_micro"]
    )
    # each share truncates independently; sum within 5/n_chars of 1e6
    assert 1_000_000 - 5 * (1_000_000 // r["n_chars"]) <= total <= 1_000_000


def _js_brute(ca: Counter, cb: Counter) -> float:
    tp, tq = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in set(ca) | set(cb):
        p, q = ca.get(w, 0) / tp, cb.get(w, 0) / tq
        m = (p + q) / 2.0
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    return js


def test_js_divergence_identical_and_disjoint(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        js_unigram_divergence,
    )

    same = spark.createDataFrame(
        [("a", "x y z z"), ("b", "x y z z")], "source string, text string"
    )
    r = js_unigram_divergence(same, group_a="a", group_b="b").collect()[0]
    assert r["js"] == 0.0
    assert r["n_tokens_a"] == 4 and r["n_tokens_b"] == 4 and r["vocab"] == 3

    disjoint = spark.createDataFrame(
        [("a", "x x y"), ("b", "u v w")], "source string, text string"
    )
    r = js_unigram_divergence(disjoint, group_a="a", group_b="b").collect()[0]
    # disjoint vocab -> JS = ln 2, modulo the 1e-6 micro-nat floors
    assert abs(r["js"] - math.log(2.0)) < 5e-6


def test_js_divergence_matches_bruteforce(spark):
    import random

    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        js_unigram_divergence,
    )

    rng = random.Random(49)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    ca: Counter = Counter()
    cb: Counter = Counter()
    for grp, cnt in (("a", ca), ("b", cb)):
        for _ in range(40):
            toks = rng.choices(vocab, k=rng.randint(1, 12))
            cnt.update(toks)
            rows.append((grp, " ".join(toks)))
    df = spark.createDataFrame(rows, "source string, text string")
    r = js_unigram_divergence(df, group_a="a", group_b="b").collect()[0]
    expected = _js_brute(ca, cb)
    # micro-nat ln floors + final 1e-6 floor: bounded error
    assert abs(r["js"] - expected) < 1e-4
    assert r["n_tokens_a"] == sum(ca.values())
    assert r["n_tokens_b"] == sum(cb.values())
    assert r["vocab"] == len(set(ca) | set(cb))


def test_js_divergence_one_empty_side_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        js_unigram_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x y"), ("b", None)], "source string, text string"
    )
    r = js_unigram_divergence(df, group_a="a", group_b="b").collect()[0]
    assert r["js"] is None and r["n_tokens_b"] == 0


def test_rare_collapse_known_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        rare_collapse,
    )

    rows = (
        [("big",)] * 10 + [("mid",)] * 5 + [("r1",)] * 2 + [("r2",)] * 1
    )
    df = spark.createDataFrame(rows, "cat string")
    got = {r["category_out"]: r for r in rare_collapse(df, "cat", 5).collect()}
    assert got["big"]["n_rows"] == 10 and got["big"]["n_levels_merged"] == 1
    assert got["mid"]["n_rows"] == 5
    other = got["__other__"]
    assert other["n_rows"] == 3 and other["n_levels_merged"] == 2
    assert len(got) == 3


def test_rare_collapse_validation_and_no_tail(spark):
    from dane_visual_feature_extraction_worker_spark.operators.encoding import (
        rare_collapse,
    )

    df = spark.createDataFrame([("a",), ("a",)], "cat string")
    with pytest.raises(ValueError):
        rare_collapse(df, "cat", 0)
    got = rare_collapse(df, "cat", 1).collect()
    assert len(got) == 1 and got[0]["category_out"] == "a"

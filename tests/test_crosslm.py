"""Cross-source LM batch: bigram cross-entropy, vocab coverage."""

from __future__ import annotations

import math
from collections import Counter

import pytest


def _brute_h(a_texts, b_texts):
    lnm = lambda v: math.floor(math.log(v) * 1e6)  # noqa: E731

    def bi(texts):
        c = Counter()
        for t in texts:
            w = t.split()
            for i in range(len(w) - 1):
                c[(w[i], w[i + 1])] += 1
        return c

    ca = bi(a_texts)
    cb = bi(b_texts)
    cp = Counter()
    for (p, _n), c in ca.items():
        cp[p] += c
    va = len({t for x in a_texts for t in x.split()})
    s = sum(
        c * (lnm(cp[p] + va) - lnm(ca[(p, n)] + 1))
        for (p, n), c in cb.items()
    )
    nb = sum(cb.values())
    return nb, va, s // nb


def test_cross_perplexity_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        cross_perplexity,
    )

    a_texts = ["a b a c", "b a b"]
    b_texts = ["a b x", "c a b a"]
    rows = [(i, t, "A") for i, t in enumerate(a_texts)]
    rows += [(10 + i, t, "B") for i, t in enumerate(b_texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = cross_perplexity(df, group_a="A", group_b="B").collect()[0]
    nb, va, h = _brute_h(a_texts, b_texts)
    assert (got["n_bigrams_b"], got["vocab_a"], got["h_micro_nat"]) == (
        nb,
        va,
        h,
    )


def test_cross_perplexity_identical_below_disjoint(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        cross_perplexity,
    )

    # B identical to A should be far more predictable than disjoint B
    rows = [(1, "a b a b a b", "A"), (2, "a b a b", "SAME"), (3, "x y x y", "DIFF")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    same = cross_perplexity(df, group_a="A", group_b="SAME").collect()[0]
    diff = cross_perplexity(df, group_a="A", group_b="DIFF").collect()[0]
    assert same["h_micro_nat"] < diff["h_micro_nat"]


def test_vocab_coverage_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        vocab_coverage,
    )

    # A counts: a:3 b:2 c:1 -> top-2 = {a, b}
    rows = [
        (1, "a a a b b c", "A"),
        (2, "a b z z z", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = vocab_coverage(df, group_a="A", group_b="B", k=2).collect()[0]
    # B tokens: a:1 b:1 z:3 -> covered = 2 of 5
    assert (got["n_tokens_b"], got["vocab_b"], got["covered"]) == (5, 3, 2)
    assert got["coverage_micro"] == 2 * 1_000_000 // 5
    with pytest.raises(ValueError):
        vocab_coverage(df, k=0)


def test_vocab_coverage_tie_break_is_lexicographic(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        vocab_coverage,
    )

    # A: p:1 q:1 r:1 all tied -> top-2 by (count desc, term asc) = {p, q}
    rows = [(1, "p q r", "A"), (2, "q r", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = vocab_coverage(df, group_a="A", group_b="B", k=2).collect()[0]
    assert got["covered"] == 1  # only q

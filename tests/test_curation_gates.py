"""Curation-gates batch: hapax-legomena share, cross-doc duplicate
n-gram coverage, refusal-phrase rate."""

from __future__ import annotations

from collections import Counter


def test_hapax_share_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        hapax_share,
    )

    rows = [
        (1, "a b c a", "s0"),
        (2, "b d", "s0"),
        (3, "x y z", "s1"),
        (4, "x x", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["grp"]: r for r in hapax_share(df).collect()}
    # s0 tokens: a:2 b:2 c:1 d:1 -> vocab 4, hapax 2, n_tokens 6
    assert (got["s0"]["n_tokens"], got["s0"]["vocab"], got["s0"]["hapax"]) == (
        6,
        4,
        2,
    )
    assert got["s0"]["hapax_vocab_micro"] == 2 * 1_000_000 // 4
    assert got["s0"]["hapax_token_micro"] == 2 * 1_000_000 // 6
    # s1 tokens: x:3 y:1 z:1 -> vocab 3, hapax 2, n_tokens 5
    assert (got["s1"]["n_tokens"], got["s1"]["vocab"], got["s1"]["hapax"]) == (
        5,
        3,
        2,
    )


def test_hapax_all_unique_and_all_repeated(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        hapax_share,
    )

    df = spark.createDataFrame(
        [(1, "p q r", "uniq"), (2, "m m m m", "rep")],
        "doc_id long, text string, source string",
    )
    got = {r["grp"]: r for r in hapax_share(df).collect()}
    assert got["uniq"]["hapax_vocab_micro"] == 1_000_000
    assert got["rep"]["hapax_vocab_micro"] == 0
    assert got["rep"]["hapax_token_micro"] == 0


def test_dup_ngram_coverage_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        dup_ngram_coverage,
    )

    rows = [
        # docs 1 & 2 share the 3-gram "a b c"; doc 3 is disjoint
        (1, "a b c d", "s0"),
        (2, "a b c", "s0"),
        (3, "p q r s", "s0"),
        # short doc: no 3-grams at all
        (4, "u v", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["grp"]: r for r in dup_ngram_coverage(df, k=3).collect()}

    def grams(text, k=3):
        t = text.split()
        return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]

    occ = Counter()
    docs = {}
    for doc_id, text, src in rows:
        if src != "s0":
            continue
        for g in grams(text):
            occ[g] += 1
            docs.setdefault(g, set()).add(doc_id)
    n_occ = sum(occ.values())
    dup = sum(c for g, c in occ.items() if len(docs[g]) >= 2)
    s0 = got["s0"]
    assert (s0["n_gram_occ"], s0["n_grams"], s0["dup_occ"]) == (
        n_occ,
        len(occ),
        dup,
    )
    assert s0["dup_occ_micro"] == dup * 1_000_000 // n_occ
    # "a b c" occurs twice across two docs; 2 b-c-d/p-q-r grams unique
    assert s0["dup_occ"] == 2
    # s1 has zero grams -> the group is ABSENT (explode drops empty
    # arrays; the oracle's len(a) >= 3 filter drops them identically)
    assert "s1" not in got


def test_dup_ngram_within_doc_repeat_is_not_cross_doc(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        dup_ngram_coverage,
    )

    # "a b a b a b": gram "a b a" occurs twice WITHIN one doc only —
    # cross-doc coverage must stay 0.
    df = spark.createDataFrame(
        [(1, "a b a b a b", "s0")], "doc_id long, text string, source string"
    )
    got = dup_ngram_coverage(df, k=3).collect()[0]
    assert got["dup_occ"] == 0 and got["n_gram_occ"] == 4


def test_refusal_rate_hits_and_misses(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import refusal_rate

    rows = [
        (1, "I'm sorry, I can't help with that.", "rlhf"),
        (2, "As an AI language model I cannot do this.", "rlhf"),
        (3, "Sure! Here is the answer.", "rlhf"),
        (4, "The quick brown fox.", "web"),
        (5, None, "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["grp"]: r for r in refusal_rate(df).collect()}
    assert (got["rlhf"]["n_docs"], got["rlhf"]["docs_hit"]) == (3, 2)
    assert got["rlhf"]["hit_doc_micro"] == 2 * 1_000_000 // 3
    assert (got["web"]["n_docs"], got["web"]["docs_hit"]) == (2, 0)


def test_refusal_rate_custom_lexicon_and_validation(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.dq import refusal_rate

    df = spark.createDataFrame(
        [(1, "DECLINED by policy", "a")], "doc_id long, text string, source string"
    )
    got = refusal_rate(df, phrases=("declined",)).collect()[0]
    assert got["docs_hit"] == 1
    with pytest.raises(ValueError):
        refusal_rate(df, phrases=())

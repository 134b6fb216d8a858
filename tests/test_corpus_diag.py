"""Thirty-seventh batch: Gini activity concentration, k-anonymity
audit, Zipf slope, Heaps vocabulary-growth curve."""

from __future__ import annotations

import itertools
import math

import pyspark.sql.functions as F


def test_gini_all_equal_is_zero(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        gini_report,
    )

    # 4 users x 3 events each -> perfectly equal -> gini 0
    rows = [(u, i) for u in range(4) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    row = gini_report(df, "user_id").collect()[0]
    assert row["n_entities"] == 4
    assert row["total_events"] == 12
    assert row["gini"] == 0.0


def test_gini_matches_bruteforce_pairs(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        gini_report,
    )

    counts = [1, 1, 2, 5, 5, 9, 40]  # duplicated levels on purpose
    rows = [(u, i) for u, c in enumerate(counts) for i in range(c)]
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    row = gini_report(df, "user_id").collect()[0]
    n, s = len(counts), sum(counts)
    absdiff = sum(
        abs(a - b) for a, b in itertools.product(counts, counts)
    )
    expected = math.floor(absdiff / (2.0 * n * s) * 1e6) / 1e6
    assert row["gini"] == expected
    assert row["n_entities"] == n
    assert row["total_events"] == s


def test_k_anonymity_histogram(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        k_anonymity_report,
    )

    # classes: (en,a)x1, (en,b)x2, (nl,a)x2, (nl,b)x5
    rows = (
        [("en", "a")] + [("en", "b")] * 2 + [("nl", "a")] * 2 + [("nl", "b")] * 5
    )
    df = spark.createDataFrame(rows, "lang string, src string")
    got = {
        r["group_size"]: r
        for r in k_anonymity_report(
            df, {"lang": F.col("lang"), "src": F.col("src")}, k=3
        ).collect()
    }
    assert got[1]["n_groups"] == 1 and got[1]["at_risk"]
    assert got[2]["n_groups"] == 2 and got[2]["at_risk"]
    assert got[2]["n_rows"] == 4
    assert got[5]["n_groups"] == 1 and not got[5]["at_risk"]


def test_k_anonymity_counts_null_qi_as_class(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        k_anonymity_report,
    )

    df = spark.createDataFrame(
        [("en",), (None,), (None,)], "lang string"
    )
    got = {
        r["group_size"]: r["n_groups"]
        for r in k_anonymity_report(df, {"lang": F.col("lang")}, k=2).collect()
    }
    assert got == {1: 1, 2: 1}


def test_zipf_slope_exact_power_law(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        zipf_slope,
    )

    # counts = round(1000/r): ln n ~ -1 * ln rank + ln 1000
    docs = spark.createDataFrame(
        [
            (r, " ".join([f"w{r}"] * max(1, round(1000 / r))))
            for r in range(1, 51)
        ],
        "doc_id long, text string",
    )
    row = zipf_slope(docs, k=50).collect()[0]
    assert row["n_terms"] == 50
    assert -1.05 < row["slope"] < -0.95
    assert abs(row["intercept_ln"] - math.log(1000)) < 0.1


def test_zipf_slope_matches_micro_floor_ols(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        zipf_slope,
    )

    freqs = {"aa": 7, "bb": 5, "cc": 5, "dd": 2, "ee": 1}
    docs = spark.createDataFrame(
        [(0, " ".join(t for t, c in freqs.items() for _ in range(c)))],
        "doc_id long, text string",
    )
    row = zipf_slope(docs, k=5).collect()[0]
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1e6) for i in range(len(ranked))]
    ys = [math.floor(math.log(c) * 1e6) for _, c in ranked]
    nt = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (nt * sxy - sx * sy) / (nt * sxx - sx * sx)
    intercept = (sy - slope * sx) / nt / 1e6
    assert row["slope"] == math.floor(slope * 1e6) / 1e6
    assert row["intercept_ln"] == math.floor(intercept * 1e6) / 1e6


def test_vocab_growth_cumulative_exact(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        vocab_growth,
    )

    # w = 9 DIV 3 + 1 = 4 -> buckets {0:ids 0-3, 1:ids 4-7, 2:ids 8-9}
    docs = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "a c"),
            (2, "b"),
            (3, "a"),
            (4, "c d"),
            (5, "d e"),
            (6, "a"),
            (7, "e"),
            (8, "f"),
            (9, "a f"),
        ],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in vocab_growth(docs, n_buckets=3).collect()}
    assert got[0]["n_docs"] == 4 and got[0]["new_terms"] == 3
    assert got[1]["n_docs"] == 4 and got[1]["new_terms"] == 2
    assert got[2]["n_docs"] == 2 and got[2]["new_terms"] == 1
    assert got[2]["docs_cum"] == 10 and got[2]["vocab_cum"] == 6
    # flat-tail invariant: vocab_cum is non-decreasing
    buckets = sorted(got)
    assert all(
        got[a]["vocab_cum"] <= got[b]["vocab_cum"]
        for a, b in zip(buckets, buckets[1:])
    )


def test_vocab_growth_empty_bucket_emits_zero(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        vocab_growth,
    )

    # all terms seen in bucket 0; bucket 1 docs repeat them
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x"), (2, "y x"), (3, "y")],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in vocab_growth(docs, n_buckets=2).collect()}
    assert got[0]["new_terms"] == 2
    assert got[1]["new_terms"] == 0
    assert got[1]["vocab_cum"] == 2


def test_ngram_diversity_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        ngram_diversity,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            ("a", "x y z x y"),
            ("a", "x x x"),
            ("b", "hello"),
            ("b", ""),
        ],
        "source string, text string",
    )
    got = {
        (r["grp"], r["n"]): r
        for r in ngram_diversity(docs, ns=(1, 2, 3)).collect()
    }

    def grams(text, n):
        t = [w for w in text.lower().split() if w]
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]

    corpora = {"a": ["x y z x y", "x x x"], "b": ["hello", ""]}
    for src, texts in corpora.items():
        for n in (1, 2, 3):
            all_g = [g for t in texts for g in grams(t, n)]
            if not all_g:
                assert (src, n) not in got
                continue
            r = got[(src, n)]
            assert r["total_ngrams"] == len(all_g)
            assert r["distinct_ngrams"] == len(set(all_g))
            assert (
                r["distinct_micro"]
                == len(set(all_g)) * 1_000_000 // len(all_g)
            )
    # mode collapse is visible: source a repeats, b does not
    assert got[("a", 1)]["distinct_micro"] < got[("b", 1)]["distinct_micro"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ngram_diversity(docs, ns=())


def test_pii_audit_counts_and_null_text(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        pii_audit,
    )

    docs = spark.createDataFrame(
        [
            ("a", "mail bob@x.io and alice@y.org plus 1234567"),
            ("a", "clean text"),
            ("a", None),
            ("b", "num 987654321 and 000111 again 42"),
        ],
        "source string, text string",
    )
    got = {
        (r["grp"], r["pattern"]): r for r in pii_audit(docs).collect()
    }
    a_em = got[("a", "email")]
    assert (a_em["n_docs"], a_em["docs_hit"], a_em["total_hits"]) == (3, 1, 2)
    assert a_em["hit_doc_micro"] == 1_000_000 // 3
    b_ln = got[("b", "longnum")]
    assert (b_ln["docs_hit"], b_ln["total_hits"]) == (1, 2)
    assert got[("b", "email")]["docs_hit"] == 0
    # longnum must not fire on the 7-digit number inside source a? it does:
    assert got[("a", "longnum")]["total_hits"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pii_audit(docs, patterns={})


def test_char_entropy_brute_force_and_bounds(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        char_entropy,
    )
    import math

    docs = spark.createDataFrame(
        [
            ("uni", "abcdefgh"),      # 8 distinct chars, uniform
            ("mono", "aaaaaaaa"),     # zero entropy
            ("mix", "aab"),
            ("mix", None),
        ],
        "source string, text string",
    )
    got = {r["grp"]: r for r in char_entropy(docs).collect()}

    def h_micro(counts):
        n = sum(counts)
        slc = sum(c * math.floor(math.log(c) * 1e6) for c in counts)
        return math.floor(math.log(n) * 1e6) - slc // n

    assert got["mono"]["entropy_micro"] == 0
    assert got["uni"]["entropy_micro"] == h_micro([1] * 8)
    # uniform case equals ln(8) up to micro flooring
    assert abs(got["uni"]["entropy_micro"] - math.log(8) * 1e6) < 16
    assert got["mix"]["n_chars"] == 3
    assert got["mix"]["distinct_chars"] == 2
    assert got["mix"]["entropy_micro"] == h_micro([2, 1])
    # ordering: uniform > mixed > constant
    assert (
        got["uni"]["entropy_micro"]
        > got["mix"]["entropy_micro"]
        > got["mono"]["entropy_micro"]
    )

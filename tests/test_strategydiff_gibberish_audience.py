"""dedup_strategy_diff / gibberish_report / audience_overlap batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_strategy_diff_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        dedup_strategy_diff,
    )

    # docs: 1,2 exact dups; 3,4 near dups (pair given, texts differ);
    # 5 unique
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "near a"), (4, "near b"),
         (5, "solo")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    r = dedup_strategy_diff(docs, pairs).first()
    # exact keeps 1,3,4,5; near keeps 1,3,5
    assert r["n_docs"] == 5
    assert r["kept_exact"] == 4 and r["kept_near"] == 3
    assert r["kept_both"] == 3
    assert r["only_near_cut"] == 1     # doc 4: near cuts, exact keeps
    assert r["only_exact_cut"] == 0
    assert r["agree_share_micro"] == 800_000


def test_strategy_diff_blocker_misses_exact_dup(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        dedup_strategy_diff,
    )

    # 1,2 exact dups, but the pair generator produced NOTHING
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    r = dedup_strategy_diff(docs, pairs).first()
    assert r["only_exact_cut"] == 1  # the recall red flag fires


def test_gibberish_flags(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        gibberish_report,
    )

    docs = spark.createDataFrame(
        [
            ("s", "this is a perfectly normal english sentence"),
            ("s", "qwrtpsdfghjklzxcvbnm mash"),             # consonant run
            ("s", "bcdfg hjklm npqrs tvwxz bcdfg hjklm"),   # low vowel
            ("s", None),
        ],
        "source string, text string",
    )
    r = gibberish_report(docs).first()
    assert r["n_docs"] == 4
    assert r["n_consonant_run"] == 2   # the mash AND the vowel-free rows
    assert r["n_low_vowel"] >= 1
    assert r["n_gibberish"] == 2
    assert r["gibberish_share_micro"] == 500_000


def test_gibberish_short_text_not_vowel_flagged(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        gibberish_report,
    )

    # < 20 letters: vowel floor doesn't apply; no 5-run either
    docs = spark.createDataFrame(
        [("s", "bcdf xyz")], "source string, text string"
    )
    r = gibberish_report(docs).first()
    assert r["n_gibberish"] == 0


def test_audience_overlap_exact(spark):
    from dane_visual_feature_extraction_worker_spark.operators.funnel import (
        audience_overlap,
    )

    rows = (
        [(u, "click") for u in (1, 2, 3)]
        + [(u, "view") for u in (2, 3, 4, 5)]
        + [(1, "click")]  # duplicate membership collapses
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = audience_overlap(df).first()
    assert (r["cat_a"], r["cat_b"]) == ("click", "view")
    assert r["n_a"] == 3 and r["n_b"] == 4
    assert r["n_both"] == 2
    assert r["jaccard_micro"] == 2 * 1_000_000 // 5


def test_audience_overlap_disjoint_pair_absent(spark):
    from dane_visual_feature_extraction_worker_spark.operators.funnel import (
        audience_overlap,
    )

    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    # no shared entity -> no output row for (a, b)
    assert audience_overlap(df).count() == 0

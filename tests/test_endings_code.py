"""Ending-profile + code-likeness batch."""

from __future__ import annotations


def test_ending_profile_flags(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        ending_profile,
    )

    rows = [
        (1, "Complete sentence.", "a"),
        (2, "Truncated mid-w", "a"),
        (3, "Trailing off...", "a"),
        (4, "Is this a question?", "a"),
        (5, "Ends with space. ", "a"),   # rtrim -> terminal
        (6, None, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = ending_profile(df).collect()[0]
    assert got["n_docs"] == 6
    # terminal: 1 ('.'), 3 ('.' of '...'), 4 ('?'), 5 ('.') -> 4
    assert got["n_terminal"] == 4
    assert got["terminal_micro"] == 4 * 1_000_000 // 6
    assert got["ellipsis_micro"] == 1 * 1_000_000 // 6
    assert got["question_micro"] == 1 * 1_000_000 // 6


def test_code_like_majority_vote(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        code_like_rate,
    )

    rows = [
        # braces + semicolons + camel -> 3 signals, code-like
        (1, "int fooBar() { a; b; }", "s"),
        # only semicolons (legal prose) -> 1 signal, NOT code-like
        (2, "first; second; third", "s"),
        # braces + 2 semicolons, no camel -> 2 signals, code-like
        (3, "{ x = 1; y = 2; }", "s"),
        # plain prose
        (4, "the quick brown fox", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = code_like_rate(df).collect()[0]
    assert got["n_code_like"] == 2
    assert got["code_like_micro"] == 2 * 1_000_000 // 4
    assert got["signal_sum"] == 3 + 1 + 2 + 0

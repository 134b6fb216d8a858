"""Sequential-pattern + mixture-planning batch."""

from __future__ import annotations

import datetime as dt

import pytest


def test_tool_trigrams_counts_and_share(spark):
    from dane_visual_feature_extraction_worker_spark.operators.toolusage import (
        tool_trigrams,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    # conv 1: a b a b a -> trigrams: "a b a", "b a b", "a b a"
    for i, t in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((1, t, base + dt.timedelta(minutes=i), i))
    # conv 2: a b a -> "a b a"
    for i, t in enumerate(["a", "b", "a"]):
        rows.append((2, t, base + dt.timedelta(minutes=i), i))
    # conv 3: too short for trigrams
    rows.append((3, "x", base, 0))
    df = spark.createDataFrame(
        rows, "conv_id long, tool string, ts timestamp, turn_idx long"
    )
    got = {r["chain"]: r for r in tool_trigrams(df, k=10).collect()}
    aba = got["a > b > a"]
    assert (aba["n_occ"], aba["n_convs_with"]) == (3, 2)
    # share over ALL conversations (3), including gram-less ones
    assert aba["conv_share_micro"] == 2 * 1_000_000 // 3
    assert got["b > a > b"]["n_occ"] == 1
    with pytest.raises(ValueError):
        tool_trigrams(df, k=0)


def test_tool_trigrams_order_is_timestamp_not_partition(spark):
    from dane_visual_feature_extraction_worker_spark.operators.toolusage import (
        tool_trigrams,
    )

    base = dt.datetime(2026, 1, 1)
    # insert rows in scrambled order; chain must follow ts order
    rows = [
        (1, "c", base + dt.timedelta(minutes=2), 2),
        (1, "a", base + dt.timedelta(minutes=0), 0),
        (1, "b", base + dt.timedelta(minutes=1), 1),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, tool string, ts timestamp, turn_idx long"
    ).repartition(4)
    got = tool_trigrams(df, k=5).collect()
    assert [r["chain"] for r in got] == ["a > b > c"]


def test_mixture_knapsack_greedy_boundary(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        mixture_knapsack,
    )

    stats = spark.createDataFrame(
        [
            ("hiq", 50, 900_000),
            ("mid", 60, 500_000),
            ("low", 40, 100_000),
        ],
        "source string, n_tokens long, score_micro long",
    )
    got = {
        r["source"]: r
        for r in mixture_knapsack(stats, budget_tokens=80).collect()
    }
    # hiq fully (50), mid partially (30 of 60), low dropped
    assert (got["hiq"]["status"], got["hiq"]["take_tokens"]) == ("full", 50)
    assert (got["mid"]["status"], got["mid"]["take_tokens"]) == (
        "partial",
        30,
    )
    assert got["mid"]["take_micro"] == 30 * 1_000_000 // 60
    assert (got["low"]["status"], got["low"]["take_tokens"]) == ("none", 0)
    assert [got[s]["rank"] for s in ("hiq", "mid", "low")] == [1, 2, 3]
    with pytest.raises(ValueError):
        mixture_knapsack(stats, budget_tokens=0)


def test_mixture_knapsack_tie_breaks_by_source(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        mixture_knapsack,
    )

    stats = spark.createDataFrame(
        [("b", 10, 500_000), ("a", 10, 500_000)],
        "source string, n_tokens long, score_micro long",
    )
    got = {r["source"]: r for r in mixture_knapsack(stats, 10).collect()}
    assert got["a"]["rank"] == 1 and got["a"]["status"] == "full"
    assert got["b"]["status"] == "none"

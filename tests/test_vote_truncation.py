"""Consensus-eval + truncation-pricing batch."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException


def test_self_consistency_majority_and_ties(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        self_consistency_vote,
    )

    rows = [
        # task 1: b wins 2-1, gold b -> correct
        (1, "a", "b"), (1, "b", "b"), (1, "b", "b"),
        # task 2: tie a/c -> lexicographic 'a', gold c -> wrong
        (2, "a", "c"), (2, "c", "c"),
        # task 3: single sample, gold matches
        (3, "x", "x"),
    ]
    df = spark.createDataFrame(rows, "task_id long, answer string, gold string")
    got = {r["task"]: r for r in self_consistency_vote(df).collect()}
    assert got[1]["majority_answer"] == "b" and got[1]["is_correct"]
    assert got[1]["n_majority"] == 2
    assert got[2]["majority_answer"] == "a" and not got[2]["is_correct"]
    assert got[3]["is_correct"]


def test_self_consistency_gold_disagreement_raises(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        self_consistency_vote,
    )

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y")],
        "task_id long, answer string, gold string",
    )
    with pytest.raises(SparkRuntimeException):
        self_consistency_vote(df).collect()


def test_truncation_loss_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.turns import (
        truncation_loss,
    )

    # conv 1: 100 tokens over rows, conv 2: 50, conv 3: 10
    rows = [(1, 60), (1, 40), (2, 50), (3, 10)]
    df = spark.createDataFrame(rows, "conv_id long, n_tokens long")
    got = {
        r["limit"]: r for r in truncation_loss(df, limits=(30, 70)).collect()
    }
    at30 = got[30]
    assert (at30["n_convs"], at30["n_over"]) == (3, 2)
    assert at30["total_tokens"] == 160
    assert at30["tokens_lost"] == (100 - 30) + (50 - 30)
    assert at30["lost_share_micro"] == 90 * 1_000_000 // 160
    at70 = got[70]
    assert (at70["n_over"], at70["tokens_lost"]) == (1, 30)
    with pytest.raises(ValueError):
        truncation_loss(df, limits=())
    with pytest.raises(ValueError):
        truncation_loss(df, limits=(0,))

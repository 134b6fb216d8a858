"""link_prediction_scores / median_of_means batch."""

from __future__ import annotations

import pyspark.sql.functions as F


def _lp(spark, pairs, cap=1000):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        link_prediction_scores,
    )

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        (r["doc_a"], r["doc_b"]): (r["common_neighbors"], r["ra_score_micro"])
        for r in link_prediction_scores(df, max_hub_degree=cap).collect()
    }


def test_lp_open_triangle(spark):
    # 1-2, 2-3: non-edge (1,3) shares neighbor 2 (deg 2) -> RA 500000
    got = _lp(spark, [(1, 2), (2, 3)])
    assert got == {(1, 3): (1, 500_000)}


def test_lp_square_diagonals(spark):
    # cycle 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2 neighbors
    got = _lp(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert got[(1, 3)] == (2, 1_000_000)  # two deg-2 middles: 2 * 500000
    assert got[(2, 4)] == (2, 1_000_000)
    assert len(got) == 2  # existing edges excluded


def test_lp_existing_edges_excluded(spark):
    # full triangle: every distance-2 pair is already an edge
    got = _lp(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {}


def test_lp_hub_cut(spark):
    # star through hub 0 (degree 5): with cap 4 the hub can't be a
    # middle vertex, so no candidates survive
    star = [(0, i) for i in range(1, 6)]
    assert _lp(spark, star, cap=4) == {}
    full = _lp(spark, star, cap=5)
    # every leaf pair shares exactly the hub: RA = 10^6 DIV 5
    assert all(v == (1, 200_000) for v in full.values())
    assert len(full) == 10


def test_mom_outlier_robust(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        median_of_means,
    )

    rows = [(i, 10.0) for i in range(640)] + [(9999, 100000.0)]
    df = spark.createDataFrame(rows, "k long, value double")
    r = median_of_means(df, "value", key=F.col("k"), shards=32).first()
    assert r["n"] == 641 and r["n_shards"] == 32
    # the outlier poisons the mean but at most one shard's mean
    assert r["mean_micro"] > 150 * 1_000_000
    assert r["mom_micro"] == 10_000_000
    assert r["gap_micro"] == r["mean_micro"] - r["mom_micro"]


def test_mom_clean_data_agrees_with_mean(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        median_of_means,
    )

    rows = [(i, 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, value double")
    r = median_of_means(df, "value", key=F.col("k"), shards=16).first()
    assert r["mom_micro"] == r["mean_micro"] == 5_000_000
    assert r["gap_micro"] == 0


def test_mom_bad_shards_raise(spark):
    import pytest

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        median_of_means,
    )

    df = spark.createDataFrame([(1, 1.0)], "k long, value double")
    with pytest.raises(ValueError):
        median_of_means(df, "value", key=F.col("k"), shards=0)

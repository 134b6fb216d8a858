"""centroid_drift / isotonic_calibration batch."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )


def test_drift_identical_cohorts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        centroid_drift,
    )

    v = [0.5, -0.25, 0.125]
    rows = [(v, 0)] * 4 + [(v, 9)] * 4
    r = centroid_drift(
        _emb(spark, rows), in_a=F.col("label") < 5, in_b=F.col("label") >= 5
    ).first()
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["cos_micro"] in (999_999, 1_000_000)  # same direction
    assert r["norm_ratio_micro"] in (999_999, 1_000_000)


def test_drift_orthogonal_cohorts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        centroid_drift,
    )

    rows = [([1.0, 0.0], 0)] * 3 + [([0.0, 1.0], 9)] * 3
    r = centroid_drift(
        _emb(spark, rows), in_a=F.col("label") < 5, in_b=F.col("label") >= 5
    ).first()
    assert r["cos_micro"] == 0


def test_drift_scale_shows_in_ratio(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        centroid_drift,
    )

    rows = [([2.0, 0.0], 0)] * 2 + [([1.0, 0.0], 9)] * 2
    r = centroid_drift(
        _emb(spark, rows), in_a=F.col("label") < 5, in_b=F.col("label") >= 5
    ).first()
    assert r["cos_micro"] in (999_999, 1_000_000)
    assert r["norm_ratio_micro"] in (1_999_999, 2_000_000)


def test_drift_empty_cohort_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        centroid_drift,
    )

    rows = [([1.0], 0)] * 2
    r = centroid_drift(
        _emb(spark, rows), in_a=F.col("label") < 5, in_b=F.col("label") >= 5
    ).first()
    assert r["cos_micro"] is None and r["norm_ratio_micro"] is None


def _brute_pav(pairs):
    """pairs: [(sum, n), ...] in x order -> fitted micro list."""
    blocks = []
    for s, n in pairs:
        blocks.append([s, n, 1])
        while len(blocks) >= 2 and \
                blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]:
            s2, n2, c2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += n2
            blocks[-1][2] += c2
    out = []
    for s, n, span in blocks:
        out.extend([(s * 10_000) // n] * span)
    return out


def _iso(spark, bins):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        isotonic_calibration,
    )

    df = spark.createDataFrame(
        [("m", x, s, n) for x, s, n in bins],
        "model string, x long, s long, n long",
    )
    rows = isotonic_calibration(df, "model", "x", "s", "n").collect()
    return [r["fitted_micro"] for r in sorted(rows, key=lambda r: r["x"])]


def test_pav_already_monotone_unchanged(spark):
    bins = [(0, 10, 10), (1, 30, 10), (2, 80, 10)]
    assert _iso(spark, bins) == [(s * 10_000) // n for _, s, n in bins]


def test_pav_pools_violators(spark):
    bins = [(0, 80, 10), (1, 20, 10), (2, 90, 10)]
    got = _iso(spark, bins)
    assert got == _brute_pav([(80, 10), (20, 10), (90, 10)])
    assert got[0] == got[1] == (100 * 10_000) // 20  # pooled pair
    assert got == sorted(got)  # monotone


def test_pav_random_matches_brute_and_monotone(spark):
    import random

    rng = random.Random(5)
    bins = [(x, rng.randrange(0, 500), rng.randrange(1, 20))
            for x in range(25)]
    got = _iso(spark, bins)
    assert got == _brute_pav([(s, n) for _, s, n in bins])
    assert got == sorted(got)


def test_pav_bin_guard(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        isotonic_calibration,
    )

    df = spark.createDataFrame(
        [("m", x, 1, 1) for x in range(5)],
        "model string, x long, s long, n long",
    )
    with pytest.raises(Exception) as ei:
        isotonic_calibration(df, "model", "x", "s", "n", max_bins=3).collect()
    assert "max_bins" in str(ei.value)

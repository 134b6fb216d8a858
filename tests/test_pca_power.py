"""power_iteration_top batch: exact-integer power method vs numpy."""

from __future__ import annotations

import numpy as np
import pytest


def _emb(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _run(spark, mat, iters=8):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        power_iteration_top,
    )

    return power_iteration_top(_emb(spark, mat), iters=iters).first()


def test_rank_one_data_explains_everything(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=6).astype(np.float32)
    mat = np.outer(rng.normal(size=40), base)  # rank-1 cloud
    r = _run(spark, mat)
    assert r["d"] == 6
    # all variance on one axis (quantization leaves crumbs)
    assert r["explained_share_micro"] >= 999_000
    assert r["top_axis"] == int(np.argmax(np.abs(base)))


def test_isotropic_data_low_share(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(400, 8))
    r = _run(spark, mat)
    # isotropic 8-dim: top share ~ 1/8, far from collapse
    assert 80_000 < r["explained_share_micro"] < 250_000


def test_matches_numpy_eigenvalue(spark):
    rng = np.random.default_rng(11)
    # anisotropic: stretch two axes so the top eigenvalue is separated
    mat = rng.normal(size=(300, 5)) * np.array([5.0, 2.0, 1.0, 1.0, 1.0])
    r = _run(spark, mat, iters=12)
    q = np.floor(mat * (1 << 24)).astype(np.int64)
    g = q.T @ q
    vals = np.linalg.eigvalsh(g.astype(np.float64))
    expect = vals[-1] / np.trace(g)
    assert r["explained_share_micro"] == pytest.approx(
        expect * 1e6, rel=2e-3
    )
    # Rayleigh quotient ~ top eigenvalue in Gram units
    assert int(r["lambda_q"]) == pytest.approx(vals[-1], rel=2e-3)


def test_iters_guard(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        power_iteration_top,
    )

    with pytest.raises(ValueError):
        power_iteration_top(_emb(spark, np.eye(3)), iters=0)

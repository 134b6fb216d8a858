"""SCD2 history build/lookup semantics + exact Gramian/PCA."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _changes(spark):
    rows = [
        # user 1: open A, no-op A (absorbed), change B, change back A
        (1, 100, 10, "A"),
        (1, 200, 11, "A"),
        (1, 300, 12, "B"),
        (1, 400, 13, "A"),
        # user 2: single version
        (2, 150, 20, "C"),
        # user 3: two opens at the SAME ts (empty first interval)
        (3, 500, 30, "A"),
        (3, 500, 31, "B"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, epoch long, event_id long, attr string"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"), "event_id", "attr")


def test_scd2_build_intervals_tile_and_absorb_noops(spark):
    from dane_visual_feature_extraction_worker_spark.operators.scd2 import scd2_build

    dim = scd2_build(
        _changes(spark), "user_id", "ts", ["attr"], "event_id"
    ).collect()
    by_user = {}
    for r in dim:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["version"])
    # the no-op restatement at t=200 did NOT open a version
    assert [r["attr"] for r in u1] == ["A", "B", "A"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # intervals tile: valid_to == next valid_from; current row open-ended
    assert [r["valid_from"].timestamp() for r in u1] == [100, 300, 400]
    assert [
        r["valid_to"].timestamp() if r["valid_to"] else None for r in u1
    ] == [300, 400, None]
    assert len(by_user[2]) == 1 and by_user[2][0]["valid_to"] is None
    # same-ts double open: first version has an EMPTY interval
    u3 = sorted(by_user[3], key=lambda r: r["version"])
    assert u3[0]["valid_from"] == u3[0]["valid_to"]


def test_scd2_lookup_half_open_boundary_and_pre_history(spark):
    from dane_visual_feature_extraction_worker_spark.operators.scd2 import (
        scd2_build,
        scd2_lookup,
    )

    dim = scd2_build(_changes(spark), "user_id", "ts", ["attr"], "event_id")
    facts = spark.createDataFrame(
        [
            (1, 50, 900),  # before user 1's first version -> NULLs
            (1, 300, 901),  # exactly at a boundary -> NEW version (B)
            (1, 350, 902),  # inside [300, 400) -> B
            (1, 999, 903),  # after the last open -> current version (A)
            (3, 500, 904),  # at the double-open ts -> the later version
        ],
        "user_id long, epoch long, fact_id long",
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"), "fact_id")
    out = {
        r["fact_id"]: r
        for r in scd2_lookup(facts, dim, "user_id", "ts").collect()
    }
    assert out[900]["attr"] is None and out[900]["version"] is None
    assert out[901]["attr"] == "B" and out[901]["version"] == 2
    assert out[902]["attr"] == "B"
    assert out[903]["attr"] == "A" and out[903]["version"] == 3
    assert out[904]["attr"] == "B" and out[904]["version"] == 2


def test_scd2_build_single_exchange(spark):
    from dane_visual_feature_extraction_worker_spark.operators.scd2 import scd2_build

    plan = _plan(scd2_build(_changes(spark), "user_id", "ts", ["attr"], "event_id"))
    # change detection + interval close + version number all ride ONE
    # hash exchange on the entity key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_gram_matrix_exact_vs_numpy_and_partition_invariant(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        gram_matrix,
    )

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.6, 0.6, size=(300, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    q = np.floor(x.astype(np.float64) * (1 << 24)).astype(np.int64).astype(object)
    expect = (q.T @ q).astype(object)  # python-int matmul, no overflow
    for reparted in (df, df.repartition(13)):
        got = {(r["i"], r["j"]): int(r["gram"])
               for r in gram_matrix(reparted).collect()}
        assert len(got) == 8 * 9 // 2
        for (i, j), v in got.items():
            assert v == int(expect[i][j]), (i, j)


def test_pca_components_match_numpy_eigh(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        gram_matrix,
        pca_components,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(400, 2)) @ rng.normal(size=(2, 6)) * 0.1
    x = (base + rng.normal(size=(400, 6)) * 0.001).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    rows = gram_matrix(df).collect()
    comps = pca_components(rows, dim=6, n_rows=400, k=2)
    assert comps.shape == (6, 2)
    assert np.allclose(comps.T @ comps, np.eye(2), atol=1e-9)
    # spans the same top-2 subspace as numpy's eigh of the exact
    # second-moment matrix (2^-24 quantization error << signal)
    m = (x.astype(np.float64).T @ x.astype(np.float64)) / 400
    vals, vecs = np.linalg.eigh(m)
    ref = vecs[:, np.argsort(vals)[::-1][:2]]
    # subspace distance: projections agree
    assert np.allclose(comps @ (comps.T @ ref), ref, atol=1e-4)

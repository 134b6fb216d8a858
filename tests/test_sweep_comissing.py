"""Drift-sweep + co-missingness batch."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


def test_psi_sweep_matches_single_feature_psi(spark):
    """The sweep must reproduce psi_drift exactly, feature by feature."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        psi_drift,
        psi_sweep,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + dt.timedelta(hours=i),
                ["x", "y", "z"][i % 3 if i < 100 else (i % 2)],
                ["p", "q"][(i // 7) % 2],
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, f1 string, f2 string"
    )
    swept = psi_sweep(df, features={"f1": F.col("f1"), "f2": F.col("f2")})
    got = {
        (r["feature"], r["category"]): (r["c1"], r["c2"], r["psi_term"])
        for r in swept.collect()
    }
    for feat in ("f1", "f2"):
        single = psi_drift(df, category=feat)
        for r in single.collect():
            assert got[(feat, r[feat])] == (
                r["c1"],
                r["c2"],
                r["psi_term"],
            ), f"sweep diverged from psi_drift on {feat}/{r[feat]}"
    with pytest.raises(ValueError):
        psi_sweep(df, features={})


def test_psi_sweep_one_sided_category_is_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import psi_sweep

    base = dt.datetime(2026, 1, 1)
    # 'late_only' appears only in the second half -> NULL term
    rows = [(i, base + dt.timedelta(hours=i), "common") for i in range(10)]
    rows += [(100 + i, base + dt.timedelta(hours=100 + i), "late_only") for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, f string")
    got = {
        r["category"]: r
        for r in psi_sweep(df, features={"f": F.col("f")}).collect()
    }
    assert got["late_only"]["psi_term"] is None
    assert got["late_only"]["c1"] == 0


def test_comissing_matrix_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        comissing_matrix,
    )

    rows = [
        (None, None, 1.0),
        (None, None, None),
        (None, "x", 2.0),
        ("a", None, 3.0),
        ("b", "y", None),
        ("c", "z", 4.0),
    ]
    df = spark.createDataFrame(rows, "p string, q string, r double")
    got = {
        (r["col_a"], r["col_b"]): r for r in comissing_matrix(df, ["p", "q", "r"]).collect()
    }
    pq = got[("p", "q")]
    # p null: 3, q null: 3, both: 2, n=6 -> lift = 6*2e6/(3*3)
    assert (pq["null_a"], pq["null_b"], pq["both_null"]) == (3, 3, 2)
    assert pq["lift_micro"] == 6 * 2 * 1_000_000 // 9
    qr = got[("q", "r")]
    assert (qr["null_a"], qr["null_b"], qr["both_null"]) == (3, 2, 1)
    with pytest.raises(ValueError):
        comissing_matrix(df, ["p"])


def test_comissing_zero_marginal_is_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        comissing_matrix,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", "x")], "u string, v string"
    )
    got = comissing_matrix(df, ["u", "v"]).collect()[0]
    assert got["lift_micro"] is None  # u never null -> no 0/0 smoothing

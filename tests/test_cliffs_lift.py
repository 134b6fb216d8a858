"""cliffs_delta / lift_at_k batch."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F


def _delta(spark, a_vals, b_vals):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cliffs_delta,
    )

    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, value double")
    return cliffs_delta(df, "g", "value", "a", "b").first()


def _brute_delta(a_vals, b_vals):
    ac = [round(v * 100) for v in a_vals]
    bc = [round(v * 100) for v in b_vals]
    gt = sum(1 for x in ac for y in bc if x > y)
    lt = sum(1 for x in ac for y in bc if x < y)
    ties = sum(1 for x in ac for y in bc if x == y)
    num = (gt - lt) * 1_000_000
    den = len(ac) * len(bc)
    # trunc-toward-zero division, matching Spark DIV / DuckDB //
    q = abs(num) // den
    return gt, lt, ties, (q if num >= 0 else -q)


def test_cliffs_delta_brute_force_random(spark):
    rng = random.Random(11)
    a = [round(rng.uniform(0, 30), 2) for _ in range(60)]
    b = [round(rng.uniform(5, 35), 2) for _ in range(45)]
    r = _delta(spark, a, b)
    gt, lt, ties, dmicro = _brute_delta(a, b)
    assert (r["pairs_gt"], r["pairs_lt"], r["pairs_tied"]) == (gt, lt, ties)
    assert r["delta_micro"] == dmicro
    assert (r["n_a"], r["n_b"]) == (60, 45)


def test_cliffs_delta_complete_separation(spark):
    r = _delta(spark, [10.0, 11.0, 12.0], [1.0, 2.0])
    assert r["delta_micro"] == 1_000_000
    r = _delta(spark, [1.0, 2.0], [10.0, 11.0, 12.0])
    assert r["delta_micro"] == -1_000_000


def test_cliffs_delta_identical_groups_zero(spark):
    r = _delta(spark, [3.0, 4.0, 5.0], [3.0, 4.0, 5.0])
    assert r["delta_micro"] == 0
    assert r["pairs_tied"] == 3


def _lift(spark, scored, ks=(10, 50)):
    """scored: list of (score_int, label01)."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        lift_at_k,
    )

    df = spark.createDataFrame(scored, "s bigint, y int")
    return {
        r["k_pct"]: r
        for r in lift_at_k(
            df, F.col("s"), F.col("y"), ks_percent=list(ks)
        ).collect()
    }


def test_lift_at_k_brute_force(spark):
    rng = random.Random(3)
    scored = [
        (rng.randrange(0, 40), 1 if rng.random() < 0.3 else 0)
        for _ in range(300)
    ]
    out = _lift(spark, scored, ks=(1, 5, 10, 25, 50))
    n_total = len(scored)
    pos_total = sum(y for _, y in scored)
    # brute force with take-ties: for each k, cutoff = score of the
    # K-th ranked row (desc); take every row >= that score
    ordered = sorted((s for s, _ in scored), reverse=True)
    for k, r in out.items():
        kk = math.ceil(n_total * k / 100)
        cutoff = ordered[kk - 1]
        taken = [(s, y) for s, y in scored if s >= cutoff]
        n_taken = len(taken)
        pos_taken = sum(y for _, y in taken)
        assert r["score_cutoff"] == cutoff
        assert r["n_taken"] == n_taken >= kk
        assert r["pos_taken"] == pos_taken
        assert r["precision_micro"] == pos_taken * 1_000_000 // n_taken
        assert r["recall_micro"] == pos_taken * 1_000_000 // pos_total
        assert (
            r["lift_micro"]
            == pos_taken * n_total * 1_000_000 // (n_taken * pos_total)
        )


def test_lift_at_k_perfect_scorer(spark):
    # scores strictly rank positives first: lift@10 == 1/base_rate
    scored = [(1000 - i, 1 if i < 20 else 0) for i in range(200)]
    out = _lift(spark, scored, ks=(10,))
    r = out[10]
    assert r["n_taken"] == 20 and r["pos_taken"] == 20
    assert r["precision_micro"] == 1_000_000
    assert r["lift_micro"] == 10_000_000  # base rate 10% -> lift 10x


def test_lift_at_k_all_tied_takes_everything(spark):
    scored = [(7, i % 2) for i in range(50)]
    out = _lift(spark, scored, ks=(10,))
    r = out[10]
    assert r["n_taken"] == 50  # one giant tied cell
    assert r["lift_micro"] == 1_000_000  # captures exactly base rate


def _or_report(spark, rows):
    """rows: (slice, exposed, outcome)."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        odds_ratio_report,
    )

    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    return {
        r["slice"]: r
        for r in odds_ratio_report(
            df, F.col("s"), F.col("e"), F.col("o")
        ).collect()
    }


def test_odds_ratio_brute_force(spark):
    rng = random.Random(5)
    rows = [
        ("x", rng.random() < 0.5, rng.random() < 0.4) for _ in range(300)
    ]
    r = _or_report(spark, rows)["x"]
    a = sum(1 for _, e, o in rows if e and o)
    b = sum(1 for _, e, o in rows if e and not o)
    c = sum(1 for _, e, o in rows if not e and o)
    d = sum(1 for _, e, o in rows if not e and not o)
    assert (
        r["n_exposed_pos"],
        r["n_exposed_neg"],
        r["n_unexposed_pos"],
        r["n_unexposed_neg"],
    ) == (a, b, c, d)
    assert r["odds_ratio_micro"] == a * d * 1_000_000 // (b * c)
    assert (
        r["risk_ratio_micro"] == a * (c + d) * 1_000_000 // ((a + b) * c)
    )


def test_odds_ratio_no_association_is_one(spark):
    rows = (
        [("x", True, True)] * 10 + [("x", True, False)] * 30
        + [("x", False, True)] * 5 + [("x", False, False)] * 15
    )
    r = _or_report(spark, rows)["x"]
    assert r["odds_ratio_micro"] == 1_000_000
    assert r["risk_ratio_micro"] == 1_000_000


def test_odds_ratio_empty_cell_is_null(spark):
    rows = [("x", True, True)] * 3 + [("x", False, False)] * 3
    r = _or_report(spark, rows)["x"]
    assert r["odds_ratio_micro"] is None  # b = c = 0 -> undefined
    assert r["risk_ratio_micro"] is None

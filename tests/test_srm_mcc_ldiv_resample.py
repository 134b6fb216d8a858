"""srm_check / mcc_report / l_diversity_report / resample_ffill batch."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


# ------------------------------------------------------------- srm_check

def _srm(spark, counts, weights, thr=None):
    from dane_visual_feature_extraction_worker_spark.operators.stats import srm_check

    rows = [(v,) for v, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "variant string")
    return srm_check(df, "variant", weights, threshold_micro=thr).first()


def test_srm_perfect_split_is_zero(spark):
    r = _srm(spark, {"control": 40, "a": 20, "b": 20},
             {"control": 2, "a": 1, "b": 1}, thr=13_816_000)
    assert r["chi2_micro"] == 0
    assert not r["srm_flag"]
    assert r["n_assigned"] == 80 and r["n_unassigned"] == 0
    assert r["dof"] == 2


def test_srm_matches_scipy_formula(spark):
    # chi2 = sum (o - e)^2 / e with e from the designed split
    counts = {"control": 55, "a": 30, "b": 15}
    r = _srm(spark, counts, {"control": 2, "a": 1, "b": 1}, thr=13_816_000)
    T = 100
    exp = {"control": 50.0, "a": 25.0, "b": 25.0}
    chi2 = sum((counts[v] - exp[v]) ** 2 / exp[v] for v in exp)
    assert r["chi2_micro"] == pytest.approx(chi2 * 1e6, abs=2)
    assert r["srm_flag"] == (chi2 > 13.816)
    assert r["n_control"] == 55 and r["n_a"] == 30 and r["n_b"] == 15
    assert r["n_assigned"] == T


def test_srm_unassigned_counted_not_tested(spark):
    r = _srm(spark, {"control": 20, "a": 10, "b": 10, "ghost": 7},
             {"control": 2, "a": 1, "b": 1})
    assert r["n_unassigned"] == 7
    assert r["n_assigned"] == 40
    assert r["chi2_micro"] == 0  # ghost rows excluded from the null


def test_srm_bad_weights_raise(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import srm_check

    df = spark.createDataFrame([("a",)], "variant string")
    with pytest.raises(ValueError):
        srm_check(df, "variant", {})
    with pytest.raises(ValueError):
        srm_check(df, "variant", {"a": 0})


# ------------------------------------------------------------- mcc_report

def _mcc_brute(tp, fp, tn, fn):
    num = tp * tn - fp * fn
    den = (math.sqrt(tp + fp) * math.sqrt(tp + fn)
           * math.sqrt(tn + fp) * math.sqrt(tn + fn))
    return num / den


def test_mcc_matches_brute(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import mcc_report

    cells = [(True, True)] * 30 + [(False, True)] * 10 \
        + [(False, False)] * 50 + [(True, False)] * 10
    df = spark.createDataFrame(cells, "y boolean, p boolean")
    r = mcc_report(df, F.col("y"), F.col("p")).first()
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (30, 10, 50, 10)
    assert r["accuracy_micro"] == 800_000
    assert r["mcc_micro"] == math.floor(_mcc_brute(30, 10, 50, 10) * 1e6)


def test_mcc_null_margin_is_null(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import mcc_report

    df = spark.createDataFrame(
        [(True, True)] * 5 + [(True, False)] * 5, "y boolean, p boolean"
    )  # tn + fp margin = 0
    r = mcc_report(df, F.col("y"), F.col("p")).first()
    assert r["mcc_micro"] is None
    assert r["accuracy_micro"] == 500_000


def test_mcc_null_inputs_counted(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import mcc_report

    df = spark.createDataFrame(
        [(True, True), (None, True), (False, None), (False, False)],
        "y boolean, p boolean",
    )
    r = mcc_report(df, F.col("y"), F.col("p")).first()
    assert r["n_null"] == 2
    assert r["tp"] == 1 and r["tn"] == 1


# ------------------------------------------------------- l_diversity

def test_l_diversity_histogram(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        l_diversity_report,
    )

    # class (g=1): sensitive {x, y, z} -> l=3; class (g=2): {x} -> l=1
    rows = [(1, "x"), (1, "y"), (1, "z"), (1, "x"),
            (2, "x"), (2, "x")]
    df = spark.createDataFrame(rows, "g int, s string")
    out = {
        r["sensitive_distinct"]: r
        for r in l_diversity_report(
            df, {"g": F.col("g")}, F.col("s"), l_threshold=3
        ).collect()
    }
    assert out[3]["n_groups"] == 1 and out[3]["n_rows"] == 4
    assert not out[3]["below_l"]
    assert out[1]["n_groups"] == 1 and out[1]["n_rows"] == 2
    assert out[1]["below_l"]


def test_l_diversity_null_is_a_value(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        l_diversity_report,
    )

    df = spark.createDataFrame([(1, "x"), (1, None)], "g int, s string")
    r = l_diversity_report(df, {"g": F.col("g")}, F.col("s")).first()
    assert r["sensitive_distinct"] == 2  # NULL counts as its own level


# ---------------------------------------------------- resample_ffill

def _resample(spark, rows, step):
    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        resample_ffill,
    )

    df = spark.createDataFrame(rows, "e long, ts timestamp, v double")
    return resample_ffill(
        df, entity_col="e", ts_col="ts", value_col="v", step_seconds=step
    )


def test_resample_ffill_basic(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 30)   # 30s past the hour
    rows = [
        (1, t0, 10.0),                                  # 00:00:30
        (1, t0 + dt.timedelta(minutes=90), 20.0),       # 01:30:30
        (1, t0 + dt.timedelta(hours=3), 30.0),          # 03:00:30
    ]
    out = {r["tick"]: r["value_ffill_cents"]
           for r in _resample(spark, rows, 3600).collect()}
    base = int(dt.datetime(2024, 1, 1, 1).replace(
        tzinfo=dt.timezone.utc).timestamp())
    # ticks 01:00, 02:00, 03:00 (span 00:00:30 .. 03:00:30)
    assert out == {base: 1000, base + 3600: 2000, base + 7200: 2000}


def test_resample_tick_equals_event_is_inclusive(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 2, 0, 0)  # exactly on the tick
    rows = [(1, dt.datetime(2024, 1, 1, 1, 59), 1.0), (1, t, 2.0)]
    out = {r["tick"]: r["value_ffill_cents"]
           for r in _resample(spark, rows, 3600).collect()}
    tick = int(t.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[tick] == 200  # <= is inclusive: the on-tick event wins


def test_resample_short_span_emits_nothing(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 1, 0, 10), 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 20), 2.0)]
    assert _resample(spark, rows, 3600).count() == 0


def test_resample_same_second_takes_max(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 0, 59, 59)
    rows = [(1, t, 5.0), (1, t, 9.0)]
    out = _resample(spark, rows, 3600).collect()
    # span 00:59:59..00:59:59 -> no tick; widen with a later event
    rows.append((1, dt.datetime(2024, 1, 1, 1, 30), 1.0))
    out = {r["tick"]: r["value_ffill_cents"]
           for r in _resample(spark, rows, 3600).collect()}
    tick = int(dt.datetime(2024, 1, 1, 1).replace(
        tzinfo=dt.timezone.utc).timestamp())
    assert out[tick] == 900  # deterministic max at the tied second


def test_resample_bad_step_raises(spark):
    with pytest.raises(ValueError):
        _resample(spark, [], 0)

"""PSI drift semantics + purged time-series folds."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_psi_drift_matches_reference_and_nulls_missing(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import psi_drift

    # half 1: epochs 0..99, half 2: 101..200 (cut = (0+200)/2 = 100)
    rows = []
    eid = 0
    for t in range(100):
        rows.append((eid, t, "a" if t % 4 else "b")); eid += 1
    for t in range(101, 201):
        rows.append((eid, t, "a" if t % 2 else "c")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, epoch long, event_type string"
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"), "event_type")
    out = {r["event_type"]: r for r in psi_drift(ev).collect()}
    # b only in half 1, c only in half 2 -> NULL terms, counts kept
    assert out["b"]["psi_term"] is None and out["b"]["c2"] == 0
    assert out["c"]["psi_term"] is None and out["c"]["c1"] == 0
    # 'a': replay the exact quantized pipeline
    c1, c2 = out["a"]["c1"], out["a"]["c2"]
    n1 = sum(1 for _, t, _ in rows if t <= 100)
    n2 = len(rows) - n1
    L = (
        math.floor(math.log(c1) * 1e6)
        - math.floor(math.log(n1) * 1e6)
        - math.floor(math.log(c2) * 1e6)
        + math.floor(math.log(n2) * 1e6)
    )
    term = (c1 * n2 - c2 * n1) * L / ((float(n1) * float(n2)) * 1e6)
    assert out["a"]["psi_term"] == math.floor(term * 1e6) / 1e6
    # identical halves -> every defined term is 0
    same = spark.createDataFrame(
        [(i, i % 2 * 200, "x") for i in range(40)],
        "event_id long, epoch long, event_type string",
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"), "event_type")
    z = psi_drift(same).collect()
    assert all(r["psi_term"] == 0.0 for r in z)


def test_purged_folds_tile_and_embargo(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        purged_folds,
    )

    # 100 events, 1 per second; k=5 -> 20 s val windows; 5 s embargo
    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    out = purged_folds(
        ev, ts="ts", id_col="event_id", k=5, embargo_seconds=5.0
    ).collect()
    assert len(out) == 500  # k rows per input row
    by = {(r["event_id"], r["fold"]): r["split"] for r in out}
    # every row is val in EXACTLY one fold (windows tile the range)
    for i in range(100):
        vals = [f for f in range(5) if by[(i, f)] == "val"]
        assert vals == [i // 20]
    # embargo: rows within 5 s of fold 2's window [40, 60) are purged
    assert by[(39, 2)] == "purged" and by[(35, 2)] == "purged"
    assert by[(34, 2)] == "train"
    assert by[(60, 2)] == "purged" and by[(64, 2)] == "purged"
    assert by[(65, 2)] == "train"


def test_purged_folds_zero_shuffle_plan(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        purged_folds,
    )

    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    plan = _plan(purged_folds(ev))
    # lazy broadcast bounds + narrow fold explode: the corpus never
    # hash-shuffles
    assert "Exchange hashpartitioning" not in plan, plan

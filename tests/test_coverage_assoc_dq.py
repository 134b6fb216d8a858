"""Thirty-sixth batch: interval coverage sweep, Cramér's V, Benford
audit, TPC-H Q5 regional-revenue shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_coverage_stats_hand_case(spark):
    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        coverage_stats,
    )

    # user 1: [0,10) + [5,15) merge (covered 15); [20,25) separate
    # user 2: nested [0,100) contains [10,20) — covered 100, 1 island
    df = spark.createDataFrame(
        [
            (1, 1, 0, 10),
            (1, 2, 5, 15),
            (1, 3, 20, 25),
            (2, 4, 0, 100),
            (2, 5, 10, 20),
        ],
        "user_id long, event_id long, s long, e long",
    )
    got = {
        r["user_id"]: r
        for r in coverage_stats(
            df, entity="user_id", start="s", end="e", tiebreak="event_id"
        ).collect()
    }
    assert got[1]["covered_seconds"] == 20
    assert got[1]["n_islands"] == 2
    assert got[1]["span_seconds"] == 25
    assert got[1]["n_intervals"] == 3
    assert got[2]["covered_seconds"] == 100
    assert got[2]["n_islands"] == 1


def test_coverage_stats_matches_brute_force(spark):
    """Union length via the sweep == union length via a python set,
    on an adversarial overlap mix (duplicates, touching, nested)."""
    import random

    from dane_visual_feature_extraction_worker_spark.operators.intervals import (
        coverage_stats,
    )

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(5):
        for _ in range(40):
            s = rng.randrange(0, 500)
            rows.append((u, eid, s, s + rng.randrange(1, 60)))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, s long, e long")
    got = {
        r["user_id"]: r["covered_seconds"]
        for r in coverage_stats(
            df, entity="user_id", start="s", end="e", tiebreak="event_id"
        ).collect()
    }
    for u in range(5):
        pts = set()
        for uu, _, s, e in rows:
            if uu == u:
                pts.update(range(s, e))
        assert got[u] == len(pts), f"user {u}"


def test_cramers_v_known_values(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cramers_v_report,
    )

    # perfect association: a determines b -> V = 1
    perfect = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "q")] * 10,
        "a string, b string",
    )
    row = cramers_v_report(perfect, "a", "b").collect()[0]
    assert (row["n"], row["r"], row["c"]) == (20, 2, 2)
    assert row["cramers_v"] == 1.0

    # independence: uniform 2x2 -> chi2 = 0, V = 0
    indep = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 5,
        "a string, b string",
    )
    row = cramers_v_report(indep, "a", "b").collect()[0]
    assert row["chi2_micro"] == 0
    assert row["cramers_v"] == 0.0


def test_cramers_v_matches_scipy_formula(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        cramers_v_report,
    )

    rows = (
        [("x", "p")] * 12 + [("x", "q")] * 3 + [("y", "p")] * 4
        + [("y", "q")] * 9 + [("z", "p")] * 2 + [("z", "q")] * 6
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = cramers_v_report(df, "a", "b").collect()[0]
    # brute-force chi2 with the same per-cell micro-floor
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2_micro = -n * 1_000_000
    for (a, b), o in cells.items():
        e = ra[a] * cb[b] / n
        chi2_micro += math.floor(o * o / e * 1e6)
    assert row["chi2_micro"] == chi2_micro
    v = math.sqrt((chi2_micro / 1e6) / (n * 1))  # min(3,2)-1 = 1
    assert row["cramers_v"] == math.floor(v * 1e6) / 1e6


def test_benford_report_constructed(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dq import (
        benford_report,
    )

    # 30 ones-leading, 10 twos-leading, nonpositive rows excluded
    vals = [1.23] * 10 + [150.0] * 10 + [19999.99] * 10 + [25.0] * 10
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(-5.0,), (0.0,)], "amt double"
    )
    got = {r["digit"]: r for r in benford_report(df, "amt").collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_obs"] == 30 and got[2]["n_obs"] == 10
    assert got[1]["share"] == 0.75
    assert got[1]["expected_share"] == 0.301029
    # chi2 term for digit 1: (30 - 40*0.301029)^2 / (40*0.301029)
    exp_n = 40 * 0.301029
    want = math.floor((30 - exp_n) ** 2 / exp_n * 1e6) / 1e6
    assert got[1]["chi2_term"] == want


def test_regional_revenue_plan_and_rows(spark):
    """Q5 plan: dims broadcast, exactly ONE sort-merge/shuffle hash
    join on the orderkey; result rows match a duckdb replay."""
    import duckdb

    from dane_visual_feature_extraction_worker_spark.plans import driver_queries as dq

    sf = "/root/testdata/sf0.001"
    df = dq.QUERIES["regional_revenue"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["n_name"]: (r["revenue"], r["n_items"]) for r in df.collect()}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(dq.ORACLES["regional_revenue"]).fetchall()
    }
    assert got == want

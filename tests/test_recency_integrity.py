"""Brute-force parity for recency gaps, response latency, the rolling
lag-1 autocorrelation, and the PIT leak audit (seeded random domains,
heavy ties on ts to exercise the (ts, event_id) tiebreak)."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest


def _events_df(spark, n=400, users=7, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=rng.randrange(0, 120)),  # heavy ties
                rng.randrange(users),
                rng.choice(["click", "view", "purchase", "signup", "error"]),
                round(rng.uniform(-50, 50), 2),
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    return spark.createDataFrame(pdf), pdf


def test_last_seen_gaps_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        last_seen_gaps,
    )

    df, pdf = _events_df(spark)
    got = (
        last_seen_gaps(df, types=("click", "error"))
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    last: dict[tuple, int] = {}
    exp = {}
    for r in pdf.itertuples():
        us = r.ts.value // 1000
        exp[r.event_id] = {
            t: (us - last[(r.user_id, t)]) if (r.user_id, t) in last else None
            for t in ("click", "error")
        }
        last[(r.user_id, r.event_type)] = us
    for eid, e in exp.items():
        for t in ("click", "error"):
            v = got.loc[eid, f"since_{t}_us"]
            assert (e[t] is None) == pd.isna(v), (eid, t)
            if e[t] is not None:
                assert int(v) == e[t], (eid, t)


def test_response_latency_strictly_preceding(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        response_latency,
    )

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00"] * 2
                + ["2024-01-01 00:00:05", "2024-01-01 00:00:09",
                   "2024-01-01 00:00:09"]
            ),
            "user_id": [1, 1, 1, 1, 1],
            "event_type": ["view", "click", "view", "view", "click"],
            "value": [0.0] * 5,
        }
    )
    got = (
        response_latency(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("event_id")
    )
    # click#2 ties view#1 on ts but event_id orders it after -> 0 gap
    assert int(got.loc[2, "latency_us"]) == 0
    # click#5 sees view#4 (same ts, earlier event_id), not itself
    assert int(got.loc[5, "latency_us"]) == 0
    assert set(got.index) == {2, 5}


def test_rolling_autocorr_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_autocorr,
    )

    df, pdf = _events_df(spark, n=250, users=4, seed=23)
    k = 8
    got = (
        rolling_autocorr(df, k=k).toPandas().set_index("event_id").sort_index()
    )
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    for uid, g in pdf.groupby("user_id"):
        cents = [round(v * 100) for v in g["value"]]
        for i, eid in enumerate(g["event_id"]):
            frame = cents[max(0, i - k + 1) : i + 1]
            assert int(got.loc[eid, "frame_len"]) == len(frame)
            if len(frame) < 3:
                assert pd.isna(got.loc[eid, "autocorr"])
                continue
            x, y = frame[:-1], frame[1:]
            n = len(x)
            vx = n * sum(a * a for a in x) - sum(x) ** 2
            vy = n * sum(a * a for a in y) - sum(y) ** 2
            if vx <= 0 or vy <= 0:
                assert pd.isna(got.loc[eid, "autocorr"])
                continue
            num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
            exp = math.floor(num / math.sqrt(vx * vy) * 1e6) / 1e6
            assert got.loc[eid, "autocorr"] == pytest.approx(exp, abs=1e-9)


def test_pit_leak_audit_clean_and_catches_leak(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dane_visual_feature_extraction_worker_spark.operators.integrity import (
        pit_leak_audit,
    )

    df, pdf = _events_df(spark, n=300, users=5, seed=7)
    rep = pit_leak_audit(df, anchor_mod=4).toPandas()
    assert rep["n_count_leaks"].sum() == 0
    assert rep["n_sum_leaks"].sum() == 0
    # anchors audited = rows with event_id % 4 == 0
    assert rep["n_anchors"].sum() == (pdf["event_id"] % 4 == 0).sum()
    # brute-force the audited prefix mass
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pdf["csum"] = pdf.groupby("user_id")["cents"].cumsum()
    pdf["ccnt"] = pdf.groupby("user_id").cumcount() + 1
    anch = pdf[pdf["event_id"] % 4 == 0]
    assert rep["sum_counts"].sum() == anch["ccnt"].sum()
    assert rep["sum_cents"].sum() == anch["csum"].sum()

    def leaky(d, entity="user_id"):
        # a deliberately leaky "engine": the window reads ONE ROW OF
        # THE FUTURE (… AND 1 FOLLOWING); the audit must flag it
        w = (
            Window.partitionBy(entity)
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 1)
        )
        return w

    # monkey-style: rebuild path A with the leaky frame and re-run the
    # definitional join comparison by hand
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    leak_a = df.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(leaky(df)).alias("cnt_leaky"),
    )
    honest_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    honest = df.select(
        "event_id", F.count(F.lit(1)).over(honest_w).alias("cnt_honest")
    )
    j = leak_a.join(honest, "event_id")
    n_diff = j.where(F.col("cnt_leaky") != F.col("cnt_honest")).count()
    assert n_diff > 0  # the future-reading frame is detectable

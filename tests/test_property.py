"""Property tests (hypothesis): operators vs brute-force references on
small random tables (SURVEY.md §5 item 5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from dane_visual_feature_extraction_worker_spark.operators.asof import (
    asof_join_rangejoin,
    asof_join_sorted,
    asof_join_union,
)
from dane_visual_feature_extraction_worker_spark.operators.sessionize import sessionize

# small deterministic domains keep Spark jobs fast while still hitting
# ties, duplicates, empty-side and single-row corners
_entities = st.sampled_from(["e1", "e2", "e3"])
_ts = st.integers(min_value=0, max_value=50)


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> list:
    out = []
    for _, l in left.iterrows():
        cand = right[(right["k"] == l["k"]) & (right["t"] <= l["t"])]
        if cand.empty:
            out.append((l["k"], l["t"], None, None))
        else:
            best = cand.sort_values(["t", "o"]).iloc[-1]
            out.append((l["k"], l["t"], best["t"], best["o"]))
    return sorted(out, key=lambda x: (x[0], x[1], str(x[2]), str(x[3])))


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_entities, _ts, st.integers(0, 5)), max_size=15),
)
def test_asof_all_paths_match_bruteforce_random(spark, left, right):
    lpd = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    rpd = pd.DataFrame(right, columns=["k", "t", "o"]).drop_duplicates()
    ldf = spark.createDataFrame(lpd, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    if len(rpd):
        rdf = spark.createDataFrame(rpd, "k string, t long, o int").select(
            "k", F.timestamp_seconds("t").alias("t"), "o"
        )
    else:
        rdf = spark.createDataFrame([], "k string, t timestamp, o int")

    lpd2 = lpd.copy()
    expect = _brute_asof(lpd2, rpd if len(rpd) else pd.DataFrame(columns=["k", "t", "o"]))

    for fn, kw in (
        (asof_join_union, {}),
        (asof_join_sorted, {"n_buckets": 8}),
        (asof_join_rangejoin, {"left_keys": ["k", "t"]}),
    ):
        got = fn(ldf, rdf, on="k", left_ts="t", right_ts="t", right_order="o", **kw)
        rows = sorted(
            (
                r["k"],
                int(r["t"].timestamp()),
                None if r["matched_ts"] is None else int(r["matched_ts"].timestamp()),
                r["o"],
            )
            for r in got.collect()
        )
        norm = [
            (k, t, m, o)
            for (k, t, m, o) in rows
        ]
        expect_n = [
            (k, int(t), None if m is None else int(m), None if o is None else int(o))
            for (k, t, m, o) in expect
        ]
        assert sorted(norm, key=str) == sorted(expect_n, key=str), fn.__name__


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(st.tuples(_entities, _ts), min_size=1, max_size=20),
    gap=st.integers(min_value=1, max_value=10),
)
def test_sessionize_matches_linear_scan(spark, rows, gap):
    pdf = pd.DataFrame(rows, columns=["k", "t"]).drop_duplicates()
    df = spark.createDataFrame(pdf, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    got = {
        (r["k"], int(r["ts"].timestamp())): r["session_id"]
        for r in sessionize(df, gap_seconds=float(gap), entity="k", ts="ts").collect()
    }
    # O(n) per-entity linear scan reference
    for k, g in pdf.groupby("k"):
        ts_sorted = sorted(g["t"])
        sid = 0
        prev = None
        for t in ts_sorted:
            if prev is not None and t - prev > gap:
                sid += 1
            assert got[(k, t)] == sid, (k, t)
            prev = t

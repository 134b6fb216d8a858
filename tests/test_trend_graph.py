"""Unit tests: rolling_slope (trailing least-squares trend) and
pagerank_fixed (integer PageRank over an undirected pair graph)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_rolling_slope_matches_numpy(spark):
    import numpy as np

    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_slope,
    )

    df = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 3).alias("ts"),
        (F.col("id") % 4).alias("user_id"),
        ((F.col("id") * 31 % 811) / 100.0).alias("value"),
    )
    got = {
        (r["user_id"], r["event_id"]): (r["frame_len"], r["slope"])
        for r in rolling_slope(df, k=16).collect()
    }
    pd = df.toPandas().sort_values(["user_id", "ts", "event_id"])
    for uid, g in pd.groupby("user_id"):
        cents = (g["value"] * 100).round().astype("int64").to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(cents)):
            ys = cents[max(0, i - 15) : i + 1]
            m, sl = got[(uid, ids[i])]
            assert m == len(ys)
            if len(ys) < 2:
                assert sl is None
            else:
                x = np.arange(len(ys), dtype=float)
                expect = np.polyfit(x, ys.astype(float), 1)[0] / 100.0
                assert math.isclose(sl, expect, rel_tol=1e-9, abs_tol=1e-9)


def test_rolling_slope_detects_trend_direction(spark):
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        rolling_slope,
    )

    rows = [(i, 1_700_000_000 + i, 0, float(i)) for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, epoch long, user_id long, value double"
    ).select(
        "event_id", F.timestamp_seconds("epoch").alias("ts"), "user_id", "value"
    )
    out = rolling_slope(df, k=8).orderBy("event_id").collect()
    # a perfectly linear series has slope exactly 1.0 everywhere
    assert all(math.isclose(r["slope"], 1.0) for r in out[1:])


def test_pagerank_fixed_properties(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        pagerank_fixed,
    )

    # star graph: hub 0 connected to 1..5, plus isolated node 6
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    nodes = spark.range(7).select(F.col("id").alias("doc_id"))
    ranks = {
        r["doc_id"]: r["rank_micro"]
        for r in pagerank_fixed(pairs, nodes, iters=3).collect()
    }
    assert len(ranks) == 7
    # the hub out-centralizes every leaf; leaves tie by symmetry
    leaf = {ranks[i] for i in range(1, 6)}
    assert len(leaf) == 1
    assert ranks[0] > ranks[1]
    # isolated node settles at the base (1-d) mass
    assert ranks[6] == 150_000
    # hand-rolled integer recursion for the hub after 3 rounds
    r_leaf, r_hub = 1_000_000, 1_000_000
    for _ in range(3):
        in_hub = 5 * (r_leaf // 1)  # each leaf deg 1
        in_leaf = r_hub // 5  # hub deg 5
        r_hub, r_leaf = (
            150_000 + (85 * in_hub) // 100,
            150_000 + (85 * in_leaf) // 100,
        )
    assert ranks[0] == r_hub
    assert ranks[1] == r_leaf


def test_pagerank_deterministic_across_layouts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        pagerank_fixed,
    )

    pairs = spark.createDataFrame(
        [(i, (i * 7 + 1) % 30) for i in range(30) if i != (i * 7 + 1) % 30],
        "doc_a long, doc_b long",
    )
    nodes = spark.range(30).select(F.col("id").alias("doc_id"))
    a = pagerank_fixed(pairs, nodes, iters=3).collect()
    b = pagerank_fixed(
        pairs.repartition(13), nodes.repartition(3), iters=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantize_embeddings_reconstruction_bound(spark):
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        quantize_embeddings,
    )

    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ((F.col("id") * 7 + i * 13) % 101).cast("float") / 10.0,
        ).alias("embedding"),
    )
    out = quantize_embeddings(vecs).collect()
    src = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for r in out:
        codes = [int(c) for c in r["codes"].split(",")]
        assert all(0 <= c <= 255 for c in codes)
        span = r["q_max"] - r["q_min"]
        scale = span / 255.0
        for c, x in zip(codes, src[r["vec_id"]]):
            # mid-point dequantization error <= scale/2 (+ eps)
            deq = r["q_min"] + (c + 0.5) * scale
            assert abs(deq - x) <= scale / 2 + 1e-9
    # constant vector codes to all zeros, not a division error
    const = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<float>"
    )
    row = quantize_embeddings(const).collect()[0]
    assert row["codes"] == "0,0,0" and row["q_min"] == row["q_max"]

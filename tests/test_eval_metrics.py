"""Exact AUC, mutual-information screening, NDCG ranking eval."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _brute_auc(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_auc_exact_matches_brute_force_with_ties(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import auc_exact

    pairs = [
        (10, 1), (10, 0), (8, 1), (7, 0), (7, 1), (7, 0),
        (5, 0), (5, 1), (3, 0), (1, 0), (12, 1), (2, 1),
    ]
    df = spark.createDataFrame(pairs, "s long, y int")
    row = auc_exact(df, F.col("s"), F.col("y")).collect()[0]
    assert (row["pos"], row["neg"]) == (6, 6)
    assert row["auc"] == math.floor(_brute_auc(pairs) * 1e6) / 1e6


def test_auc_exact_perfect_and_degenerate(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import auc_exact

    perfect = spark.createDataFrame(
        [(9, 1), (8, 1), (2, 0), (1, 0)], "s long, y int"
    )
    assert auc_exact(perfect, F.col("s"), F.col("y")).collect()[0]["auc"] == 1.0
    onesided = spark.createDataFrame([(3, 1), (4, 1)], "s long, y int")
    assert (
        auc_exact(onesided, F.col("s"), F.col("y")).collect()[0]["auc"] is None
    )


def test_mutual_info_matches_reference_and_clamps(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        mutual_info_select,
    )

    rows = []
    for u in range(12):
        labeled = u < 6
        rows.append((u, "view"))
        if labeled:
            rows.append((u, "error"))
        if (labeled and u < 5) or u == 6:
            rows.append((u, "x"))
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["cat"]: r for r in mutual_info_select(ev).collect()}

    def lnm(v):
        return math.floor(math.log(v) * 1e6)

    def ref(a, b, c, d):
        n = a + b + c + d
        ny = a + c
        s = 0
        for nxy, nx, yy in ((a, a + b, ny), (b, a + b, n - ny),
                            (c, c + d, ny), (d, c + d, n - ny)):
            if nxy > 0:
                s += nxy * (lnm(n) + lnm(nxy) - lnm(nx) - lnm(yy))
        return max(s, 0) // n / 1e6

    x = out["x"]
    assert (x["a"], x["b"], x["c"], x["d"]) == (5, 1, 1, 5)
    assert x["mi_nats"] == ref(5, 1, 1, 5)
    # sanity vs the true MI (quantization ≤ a few micro-nats)
    def true_mi(a, b, c, d):
        n = a + b + c + d
        tot = 0.0
        for nxy, nx, yy in ((a, a + b, a + c), (b, a + b, b + d),
                            (c, c + d, a + c), (d, c + d, b + d)):
            if nxy:
                tot += nxy / n * math.log(n * nxy / (nx * yy))
        return tot
    assert abs(x["mi_nats"] - true_mi(5, 1, 1, 5)) < 1e-4
    # 'view' is independent of the label (everyone has it): MI -> 0,
    # never negative (the clamp)
    assert out["view"]["mi_nats"] == 0.0
    # perfect association: MI = H(label) = ln 2 up to micro quantization
    assert abs(out["error"]["mi_nats"] - math.log(2)) < 1e-4


def test_ndcg_perfect_ranking_is_one(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        bm25_topk,
        ndcg_at_k,
    )

    # docs where bm25's own ranking IS the ideal ranking: more distinct
    # query terms -> strictly more relevance AND more bm25 mass
    docs = spark.createDataFrame(
        [
            (0, ["scan", "merge", "vector", "pad"]),
            (1, ["scan", "merge", "pad", "pad"]),
            (2, ["scan", "pad", "pad", "pad"]),
            (3, ["pad", "pad", "pad", "pad"]),
        ],
        "doc_id long, toks array<string>",
    )
    ranked = bm25_topk(
        docs, F.col("toks"), ["scan", "merge", "vector"], k=3
    )
    row = ndcg_at_k(
        docs, F.col("toks"), ["scan", "merge", "vector"], ranked, k=3
    ).collect()[0]
    assert row["ndcg"] == 1.0
    assert row["dcg_micro"] == row["idcg_micro"] > 0


def test_ndcg_formula_parity_on_imperfect_ranking(spark):
    from dane_visual_feature_extraction_worker_spark.operators.retrieval import (
        ndcg_at_k,
    )

    # hand-built ranked list that inverts the ideal order
    docs = spark.createDataFrame(
        [
            (0, ["scan", "merge", "vector"]),
            (1, ["scan", "merge"]),
            (2, ["scan"]),
        ],
        "doc_id long, toks array<string>",
    )
    ranked = spark.createDataFrame(
        [(2, 3.0), (1, 2.0), (0, 1.0)], "doc_id long, bm25 double"
    )
    row = ndcg_at_k(
        docs, F.col("toks"), ["scan", "merge", "vector"], ranked, k=3
    ).collect()[0]

    def terms(rels):
        return sum(
            (r * 10**12) // math.floor(math.log2(i + 2) * 1e6)
            for i, r in enumerate(rels)
        )

    dcg, idcg = terms([1, 2, 3]), terms([3, 2, 1])
    assert row["dcg_micro"] == dcg
    assert row["idcg_micro"] == idcg
    assert row["ndcg"] == (dcg * 10**6) // idcg / 1e6


def test_jl_project_numpy_parity_and_distance_preservation(spark):
    import numpy as np

    from dane_visual_feature_extraction_worker_spark.operators.linalg import jl_project
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        hyperplane_signs,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 64).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: [r[f"c{j}"] for j in range(8)]
        for r in jl_project(emb, out_dims=8, in_dims=64).collect()
    }
    S = np.array(hyperplane_signs(8, 64, seed="jl"), dtype=np.float64)

    # numpy parity: same fixed-order chain = plain left-to-right sum
    for i in range(40):
        ref = []
        for j in range(8):
            acc = 0.0
            for d in range(64):
                x = float(np.float64(vecs[i, d]))
                acc = acc + (x if S[j, d] == 1 else -x)
            ref.append(int(np.floor(acc * 1e6)))
        assert out[i] == ref, i

    # JL property (sanity, not exactness): projected squared distances
    # scaled by 1/out_dims approximate original squared distances
    P = (S @ vecs.T.astype(np.float64)).T / np.sqrt(8)
    orig = ((vecs[:20, None, :] - vecs[None, :20, :]) ** 2).sum(-1)
    proj = ((P[:20, None, :] - P[None, :20, :]) ** 2).sum(-1)
    iu = np.triu_indices(20, 1)
    ratio = proj[iu] / orig[iu]
    assert 0.3 < ratio.mean() < 1.7


def test_dedup_best_survivor_policy(spark, monkeypatch):
    import dane_visual_feature_extraction_worker_spark.plans.driver_queries as dq

    # docs 0/1/2 share identical text -> one LSH cluster; quality and
    # n_tokens tie, so the min-id tie-break picks 0. doc 7 is alone.
    txt = "the scan merge vector pipeline runs the full corpus nightly"
    docs = spark.createDataFrame(
        [(0, txt), (1, txt), (2, txt), (7, "unrelated solitary text body")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dq, "_documents", lambda s, d: docs)
    out = {r["cluster_id"]: r for r in dq.QUERIES["dedup_best"](
        spark, "unused"
    ).collect()}
    assert out[0]["survivor_id"] == 0 and out[0]["n_docs"] == 3
    assert out[7]["survivor_id"] == 7 and out[7]["n_docs"] == 1


def test_auc_and_ks_random_parity(spark):
    """Seeded random datasets: histogram AUC == brute-force pairwise
    AUC and windowed KS == brute-force ECDF max, including heavy-tie
    and skewed distributions."""
    import math
    import random

    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        auc_exact,
        ks_drift,
    )

    rng = random.Random(42)
    for trial in range(4):
        n = 60
        # small score domain -> many ties (the hard case)
        pairs = [
            (rng.randrange(6), rng.randrange(2)) for _ in range(n)
        ]
        if not any(y for _, y in pairs):
            pairs[0] = (pairs[0][0], 1)
        if all(y for _, y in pairs):
            pairs[0] = (pairs[0][0], 0)
        df = spark.createDataFrame(pairs, "s long, y int")
        row = auc_exact(df, F.col("s"), F.col("y")).collect()[0]
        assert row["auc"] == math.floor(_brute_auc(pairs) * 1e6) / 1e6, trial

        vals1 = [round(rng.uniform(0, 3), 2) for _ in range(30)]
        vals2 = [round(rng.uniform(0.5, 3.5), 2) for _ in range(25)]
        rows = [(i, i, v) for i, v in enumerate(vals1)] + [
            (100 + i, 1001 + i, v) for i, v in enumerate(vals2)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, epoch long, value double"
        ).select(
            "event_id", F.timestamp_seconds("epoch").alias("ts"), "value"
        )
        k = ks_drift(ev).collect()[0]
        c1 = [round(v * 100) for v in vals1]
        c2 = [round(v * 100) for v in vals2]
        grid = sorted(set(c1) | set(c2))
        d = max(
            abs(
                sum(1 for x in c1 if x <= g) * len(c2)
                - sum(1 for x in c2 if x <= g) * len(c1)
            )
            for g in grid
        ) / (len(c1) * len(c2))
        assert k["ks"] == math.floor(d * 1e6) / 1e6, trial

"""kNN majority-vote classification semantics."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def test_knn_classify_majority_and_tiebreak(spark):
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        knn_classify,
    )

    rng = np.random.default_rng(5)
    centers = {0: rng.normal(size=6), 1: rng.normal(size=6) + 4.0}
    rows = []
    for i in range(80):
        lab = i % 2
        v = centers[lab] + rng.normal(size=6) * 0.05
        rows.append((i, [float(x) for x in v], lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    # queries drawn from the corpus: prediction should match own class
    queries = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[1][1])], "qid long, qe array<float>"
    )
    out = {r["qid"]: r for r in knn_classify(emb, queries, k=7).collect()}
    assert out[0]["pred_label"] == 0 and out[0]["votes"] == 7
    assert out[1]["pred_label"] == 1 and out[1]["votes"] == 7
    # self-exclusion: a corpus of ONLY the query + k others of the
    # other class must not let the query vote for itself
    solo = spark.createDataFrame(
        [(100, rows[0][1], 0)] + [
            (200 + j, rows[2 * j + 1][1], 1) for j in range(5)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q2 = spark.createDataFrame(
        [(100, rows[0][1])], "qid long, qe array<float>"
    )
    r2 = knn_classify(solo, q2, k=5).collect()[0]
    assert r2["pred_label"] == 1 and r2["votes"] == 5

    # deterministic vote tie-break: 2 votes each -> smaller label wins
    tie = spark.createDataFrame(
        [
            (1, rows[0][1], 3),
            (2, rows[0][1], 3),
            (3, rows[0][1], 2),
            (4, rows[0][1], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q3 = spark.createDataFrame(
        [(99, rows[0][1])], "qid long, qe array<float>"
    )
    r3 = knn_classify(tie, q3, k=4).collect()[0]
    assert r3["pred_label"] == 2 and r3["votes"] == 2


def test_knn_partition_invariance(spark):
    from dane_visual_feature_extraction_worker_spark.operators.similarity import (
        knn_classify,
    )

    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.normal(size=5)], int(i % 4))
        for i in range(120)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)], "qid long, qe array<float>"
    )
    a = sorted(
        map(tuple, knn_classify(emb, queries, k=9).collect())
    )
    b = sorted(
        map(tuple, knn_classify(emb.repartition(11), queries, k=9).collect())
    )
    assert a == b

"""Label-propagation communities and the RFM feature block."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F


def _lpa(spark, pairs, n_nodes, rounds=3):
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        label_propagation,
    )

    p = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, n_nodes + 1)], "doc_id long"
    )
    return {
        r["doc_id"]: r["community"]
        for r in label_propagation(p, nodes, rounds=rounds).collect()
    }


def test_lpa_splits_barbell_cc_does_not(spark):
    """Two triangles joined by one bridge: ONE connected component but
    TWO LPA communities — the density-vs-reachability distinction the
    operator exists for.  Hand-computed synchronous rounds:
    l1=[2,1,1,3,4,4], l2=[1,1,1,4,3,3], l3=[1,1,1,3,3,3]."""
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
    )

    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    got = _lpa(spark, pairs, 7)
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3, 7: 7}
    p = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    cc = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(p, nodes).collect()
    }
    assert len(set(cc[i] for i in range(1, 7))) == 1  # one component
    assert len({got[i] for i in range(1, 7)}) == 2  # two communities


def test_lpa_deterministic_under_repartition(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    pairs = list(
        {
            (int(a), int(b))
            for a, b in rng.integers(1, 60, (200, 2))
            if a < b
        }
    )
    base = _lpa(spark, pairs, 60)
    from dane_visual_feature_extraction_worker_spark.operators.graph import (
        label_propagation,
    )

    p = spark.createDataFrame(pairs, "doc_a long, doc_b long").repartition(7)
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 61)], "doc_id long"
    ).repartition(3)
    again = {
        r["doc_id"]: r["community"]
        for r in label_propagation(p, nodes).collect()
    }
    assert again == base


def test_rfm_literal(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 10.50),
        (1, datetime(2024, 1, 3, 0, 0, 0), 2.25),
        (2, datetime(2024, 1, 4, 0, 0, 0), 5.00),
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    us = F.unix_micros(F.col("ts"))
    cut = e.agg(F.max(us).alias("__cut"))
    got = {
        r["user_id"]: r
        for r in e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            (F.first("__cut") - F.max(us)).cast("bigint").alias("recency_us"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .collect()
    }
    assert got[1]["recency_us"] == 86_400_000_000  # one day behind user 2
    assert got[1]["frequency"] == 2
    assert got[1]["monetary"] == 12.75
    assert got[2]["recency_us"] == 0


def test_preference_pairs_distinct_and_ranked(spark):
    """chosen != rejected for every emitted source; singleton sources
    emit nothing; chosen_quality >= rejected_quality."""
    import __spark_entry__ as entry

    out = entry.queries()["preference_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    for r in out:
        assert r["chosen_id"] != r["rejected_id"]
        assert r["chosen_quality"] >= r["rejected_quality"]

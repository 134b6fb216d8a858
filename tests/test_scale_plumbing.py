"""Scale-plumbing batch: two-phase global index / curriculum order,
hour-of-day chi-square periodicity, walk-forward CV splits."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_global_index_matches_row_number_any_partitioning(spark):
    from dane_visual_feature_extraction_worker_spark.operators.layout import global_index

    rows = [(i, (i * 7919) % 100) for i in range(200)]
    df = _docs(spark, rows)
    exp = {
        r["doc_id"]: r["rn"]
        for r in df.select(
            "doc_id",
            (
                F.row_number().over(Window.orderBy("n_chars", "doc_id")) - 1
            ).alias("rn"),
        ).collect()
    }
    for nparts in (1, 3, 16):
        got = {
            r["doc_id"]: r["global_idx"]
            for r in global_index(
                df, order_by=["n_chars", "doc_id"], partitions=nparts
            ).collect()
        }
        assert got == exp, f"partition-count {nparts} changed the index"


def test_global_index_contiguous_and_duplicate_key_safe(spark):
    from dane_visual_feature_extraction_worker_spark.operators.layout import global_index

    # every n_chars identical: the tiebreak column alone must define
    # the total order, and the index must stay contiguous 0..n-1
    df = _docs(spark, [(i, 42) for i in range(50)])
    got = global_index(df, order_by=["n_chars", "doc_id"], partitions=4)
    rows = {r["doc_id"]: r["global_idx"] for r in got.collect()}
    assert sorted(rows.values()) == list(range(50))
    assert rows == {i: i for i in range(50)}


def test_curriculum_order_shortest_first(spark):
    from dane_visual_feature_extraction_worker_spark.operators.layout import (
        curriculum_order,
    )

    df = _docs(spark, [(1, 30), (2, 10), (3, 20), (4, 10)])
    got = {
        r["doc_id"]: r["curriculum_rank"]
        for r in curriculum_order(df, partitions=2).collect()
    }
    # ties on n_chars=10 break by doc_id
    assert got == {2: 0, 4: 1, 3: 2, 1: 3}


def test_periodicity_uniform_and_spike(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        periodicity_report,
    )

    base = dt.datetime(2026, 1, 1)
    rows = []
    # entity 1: exactly one event in every hour -> chi2 = 0
    for h in range(24):
        rows.append((100 + h, base + dt.timedelta(hours=h), 1))
    # entity 2: 24 events all at hour 3 -> chi2 = n*(B-1) = 24*23
    for i in range(24):
        rows.append((200 + i, base + dt.timedelta(hours=3, days=i), 2))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r["entity"]: r for r in periodicity_report(df).collect()}
    assert got[1]["chi2_micro"] == 0
    assert got[1]["active_buckets"] == 24
    assert got[2]["chi2_micro"] == 24 * 23 * 1_000_000
    assert got[2]["active_buckets"] == 1
    with pytest.raises(ValueError):
        periodicity_report(df, n_buckets=1)


def test_periodicity_brute_force(spark):
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        periodicity_report,
    )

    base = dt.datetime(2026, 1, 1)
    hours = [0, 0, 1, 5, 5, 5, 23]
    rows = [
        (i, base + dt.timedelta(hours=h, days=i), 7)
        for i, h in enumerate(hours)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    n = len(hours)
    so2 = sum(hours.count(h) ** 2 for h in set(hours))
    exp = (24 * so2 - n * n) * 1_000_000 // n
    got = periodicity_report(df).collect()[0]
    assert (got["n_events"], got["chi2_micro"]) == (n, exp)


def test_walk_forward_splits_expanding(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        walk_forward_splits,
    )

    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i)) for i in range(10)],
        "event_id long, ts timestamp",
    )
    got = sorted(
        walk_forward_splits(df, k=4, partitions=3).collect(),
        key=lambda r: r["fold"],
    )
    # 10 rows, k=4: fold sizes by idx*4 DIV 10 -> 3,2,3,2
    assert [r["n_test"] for r in got] == [3, 2, 3, 2]
    assert [r["n_train"] for r in got] == [0, 3, 5, 8]
    # expanding windows: each test window starts after the train span
    assert got[1]["ts_min"] > got[0]["ts_max"]
    assert got[3]["ts_min"] > got[2]["ts_max"]
    with pytest.raises(ValueError):
        walk_forward_splits(df, k=1)

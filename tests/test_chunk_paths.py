"""chunk_dedup reassembly semantics + session_paths behavior."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunk_dedup_first_keeps_and_reassembles(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import chunk_dedup

    boiler = "the quick brown fox"  # one 4-word chunk of boilerplate
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),  # loses the boilerplate
            (3, boiler + " alpha beta gamma delta"),  # full dup of doc 1 -> drops
            (4, "iota kappa"),  # short doc, one partial chunk
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs, window=4).collect()}
    assert out[1]["clean_text"] == boiler + " alpha beta gamma delta"
    assert out[1]["n_kept"] == 2 and out[1]["n_chunks"] == 2
    # doc 2 keeps only its unique second chunk; boilerplate removed
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[2]["n_kept"] == 1 and out[2]["n_chunks"] == 2
    # doc 3 was chunk-for-chunk identical to doc 1: dropped entirely
    assert 3 not in out
    assert out[4]["clean_text"] == "iota kappa" and out[4]["n_chunks"] == 1


def test_chunk_dedup_reassembly_preserves_chunk_order(spark):
    from dane_visual_feature_extraction_worker_spark.operators.dedup import chunk_dedup

    words = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = chunk_dedup(docs.repartition(7), window=8).collect()[0]
    assert out["clean_text"] == words
    assert out["n_kept"] == out["n_chunks"] == 5


def test_session_paths_bounded_by_session(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        session_paths,
    )

    rows = [
        # session 1 of user 1: view > view > buy
        (1, 0, 1, "view"), (1, 60, 2, "view"), (1, 120, 3, "buy"),
        # gap > 1h: new session — a path may NOT span the boundary
        (1, 10_000, 4, "view"), (1, 10_060, 5, "view"), (1, 10_120, 6, "buy"),
        # user 2: same trigram once, then too-short tail
        (2, 0, 7, "view"), (2, 60, 8, "view"), (2, 120, 9, "buy"),
        (2, 180, 10, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, epoch long, event_id long, event_type string"
    ).select(
        "user_id", F.timestamp_seconds("epoch").alias("ts"), "event_id",
        "event_type",
    )
    got = {
        r["path"]: r["n"]
        for r in session_paths(
            ev, gap_seconds=3600.0, entity="user_id", ts="ts",
            type_col="event_type", order=["ts", "event_id"], path_len=3, k=10,
        ).collect()
    }
    # 3 full trigrams (two sessions of user 1 + user 2's first window),
    # one partial window (view>buy>view for user 2) — and NO path
    # crossing the session gap (buy>view>view would be one)
    assert got["view>view>buy"] == 3
    assert got.get("view>buy>view") == 1
    assert "buy>view>view" not in got


def test_session_paths_plan_two_exchanges_takeordered(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
        session_paths,
    )

    ev = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 30).alias("ts"),
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
    )
    plan = _plan(
        session_paths(ev, entity="user_id", order=["ts", "event_id"])
    )
    # one entity exchange (sessionize + leads share it via the subset
    # rule) + one partial-agg exchange for the path count; top-k is
    # TakeOrdered, never a global sort
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "TakeOrderedAndProject" in plan

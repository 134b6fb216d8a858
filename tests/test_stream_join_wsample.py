"""Unit tests: stream-stream interval join (batch parity on a bounded
run) and A-Res weighted sampling."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from dane_visual_feature_extraction_worker_spark.streaming.joins import (
        interval_join_sink_append,
    )

    src = str(tmp_path / "events")
    spark.range(400).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 13).alias("ts"),
        (F.col("id") % 8).alias("user_id"),
        F.when(F.col("id") % 3 == 0, "click").otherwise("purchase").alias(
            "event_type"
        ),
    ).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    def split(df):
        c = df.where("event_type = 'click'").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        p = df.where("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return c, p

    sc, sp = split(stream)
    interval_join_sink_append(
        sc,
        sp,
        on="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        interval_seconds=120.0,
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(tmp_path / "sink"))
            .select("click_id", "purchase_id")
            .collect(),
        )
    )
    bc, bp = split(batch)
    expect = sorted(
        map(
            tuple,
            bc.join(
                bp,
                (bc["user_id"] == bp["user_id"])
                & (bp["purchase_ts"] >= bc["click_ts"])
                & (
                    bp["purchase_ts"]
                    <= bc["click_ts"] + F.expr("INTERVAL 120 SECONDS")
                ),
            )
            .select("click_id", "purchase_id")
            .collect(),
        )
    )
    assert got == expect and len(got) > 0


def test_weighted_sample_properties(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        weighted_sample,
    )

    # two strata: heavy docs (weight 100) vs light docs (weight 1)
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, 100).otherwise(1).alias("n_chars"),
    )
    out = weighted_sample(docs, k=200, weight_col="n_chars", salt="t")
    rows = out.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r["doc_id"] < 1000)
    # E[heavy] ≈ 198 of 200; even loosely, heavy docs must dominate
    assert heavy > 150
    # deterministic across layouts and re-runs
    again = weighted_sample(
        docs.repartition(17), k=200, weight_col="n_chars", salt="t"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # zero-weight rows are excluded, not silently kept
    z = spark.createDataFrame(
        [(1, 0), (2, 5)], "doc_id long, n_chars long"
    )
    kept = weighted_sample(z, k=10, weight_col="n_chars").collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_weighted_sample_take_ordered_plan(spark):
    from dane_visual_feature_extraction_worker_spark.operators.sampling import (
        weighted_sample,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("n_chars")
    )
    plan = (
        weighted_sample(docs, k=5, weight_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan

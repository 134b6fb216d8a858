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


def test_stream_interval_join_left_outer_emits_after_watermark(
    spark, tmp_path
):
    """Outer emission semantics: unmatched left rows appear null-extended
    once a later micro-batch's watermark passes their join horizon. A
    maxFilesPerTrigger=1 replay of two time-ordered files gives the
    multi-batch watermark advance a bounded run needs."""
    import os

    from dane_visual_feature_extraction_worker_spark.streaming.joins import (
        stream_interval_join,
    )

    src = str(tmp_path / "ev")
    os.makedirs(src)
    # batch 0: one matched click+purchase pair and one never-matched
    # click
    spark.createDataFrame(
        [
            (0, 1_700_000_000, 1, "click"),
            (1, 1_700_000_010, 1, "purchase"),  # matches click 0
            (2, 1_700_000_000, 2, "click"),  # never matched
        ],
        "event_id long, epoch long, user_id long, event_type string",
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 1: far-future rows on BOTH sides (distinct users so they
    # don't match each other). The watermark is the MIN across the two
    # watermark operators, and each side's operator only sees rows that
    # survive its event_type filter — a purchase-only file would leave
    # the clicks watermark at batch 0 and the outer row would never
    # flush. Watermarks update at batch COMPLETION and outer rows emit
    # in a LATER batch, so a third file forces the flush batch (the
    # sessionize entries' sentinel lesson: availableNow does not run a
    # free final batch).
    import time

    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(
        [
            (50, 1_700_090_000, 8, "click"),
            (51, 1_700_090_000, 9, "purchase"),
        ],
        "event_id long, epoch long, user_id long, event_type string",
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [
            (60, 1_700_090_001, 18, "click"),
            (61, 1_700_090_001, 19, "purchase"),
        ],
        "event_id long, epoch long, user_id long, event_type string",
    ).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema

    def read_side() -> "F.DataFrame":
        # each side gets its OWN readStream: deriving both from one
        # scan makes lw[on] == rw[on] resolve to the same attribute id
        # (Spark warns "trivially true equals predicate") and the
        # equi-join degrades to a pure range join
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select("*", F.timestamp_seconds("epoch").alias("ts"))
        )

    clicks = read_side().where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = read_side().where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    out = stream_interval_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        interval_seconds=60.0,
        watermark_delay="10 seconds",
        how="leftOuter",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        r["click_id"]: r["purchase_id"]
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    # the matched pair emits as a normal inner result
    assert rows.get(0) == 1
    # the unmatched click emits NULL-extended after the batch-1
    # watermark crossed its horizon
    assert 2 in rows and rows[2] is None
    # the far-future unmatched clicks stay buffered: the final
    # watermark never passes their horizon, so a bounded run does not
    # emit them (they are state, not output)
    assert 50 not in rows and 60 not in rows

"""Plan audits for the round-5 sixth-wave batches (band join, KMV
overlap, bitmap features, audience overlap, median-of-means, centroid
drift) — exchange counts and join shapes pinned."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_band_join_is_equi_join_only(spark):
    """The whole point: a pure hash-partitionable equi-join on
    (key, bucket) — no BroadcastNestedLoopJoin, no cartesian, no
    range-condition join."""
    from dane_visual_feature_extraction_worker_spark.operators.joins import (
        band_join,
    )

    l = spark.range(500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 13 % 997).alias("v")
    )
    r = spark.range(500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 29 % 997).alias("v")
    )
    p = _plan(
        band_join(l, r, on=["k"], left_val=F.col("v"),
                  right_val=F.col("v"), eps=10,
                  left_cols=[], right_cols=[])
    )
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p), p


def test_kmv_overlap_uses_take_ordered(spark):
    """Bottom-k reads plan as TakeOrderedAndProject (per-partition
    top-k + k·p merge), never a global Sort of the hash frame."""
    from dane_visual_feature_extraction_worker_spark.operators.sketches import (
        kmv_overlap,
    )

    df = spark.range(2000).select(
        F.col("id").alias("v"),
        (F.col("id") % 2 == 0).alias("a"),
        (F.col("id") % 3 == 0).alias("b"),
    )
    p = _plan(kmv_overlap(df, "v", in_a=F.col("a"), in_b=F.col("b"), k=64))
    assert p.count("TakeOrderedAndProject") == 3, p  # union + A + B
    # the plan string shows the distinct exchange once per branch;
    # scoped_persist dedupes it at execution (one InMemoryTableScan),
    # so the pin here is "same single key, never a global Sort"
    assert p.count("Exchange hashpartitioning") <= 3, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p


def test_activity_bitmap_single_exchange_no_window(spark):
    from dane_visual_feature_extraction_worker_spark.operators.recency import (
        activity_bitmap,
    )

    e = spark.range(3000).select(
        (F.col("id") % 97).alias("user_id"),
        F.timestamp_seconds(
            F.lit(19723 * 86400) + (F.col("id") % 29) * 86400 + 7
        ).alias("ts"),
    )
    p = _plan(activity_bitmap(e, epoch_day0=19723, horizon_days=31))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" not in p, p  # the zero-window claim
    assert "Join" not in p, p


def test_audience_overlap_no_cartesian(spark):
    from dane_visual_feature_extraction_worker_spark.operators.funnel import (
        audience_overlap,
    )

    e = spark.range(1000).select(
        (F.col("id") % 50).alias("user_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("event_type"),
    )
    p = _plan(audience_overlap(e))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_median_of_means_bounded_sort_only(spark):
    """The only Sort is over the |shards|-row means frame (single
    partition of 32 rows), never the corpus."""
    from dane_visual_feature_extraction_worker_spark.operators.stats import (
        median_of_means,
    )

    e = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    p = _plan(median_of_means(e, "v", key=F.col("k"), shards=32))
    assert p.count("Exchange hashpartitioning") == 1, p  # the shard agg
    assert "Join" not in p, p


def test_centroid_drift_one_position_exchange(spark):
    from dane_visual_feature_extraction_worker_spark.operators.linalg import (
        centroid_drift,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("float") for i in range(4)])
        .alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    p = _plan(
        centroid_drift(emb, in_a=F.col("label") < 5, in_b=F.col("label") >= 5)
    )
    # the (position)-key aggregate is the only hash exchange; the final
    # scalars ride SinglePartition collapses + broadcasts
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "CartesianProduct" not in p, p

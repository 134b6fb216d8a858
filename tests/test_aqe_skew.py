"""Evidence test: AQE's runtime skew-join mitigation actually fires on
this engine's join shapes — the `salted_hot_join` operator is the
MANUAL mitigation (for engines/configs without AQE or for window
kernels AQE can't split); this test pins that the DEFAULT session
config (session.py:32-34) lets Spark split a skewed sort-merge join
partition at runtime, so big-big joins need no hand salting on an
AQE-enabled cluster."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_smj_partition(spark):
    """One key holds ~90% of the left side. With thresholds forced low
    enough for the toy size, the final adaptive plan must mark the
    sort-merge join as skew-handled ("skew=true") and the answer must
    equal the broadcast-free exact join count."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force SMJ: no broadcast
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.shuffle.partitions", "8")

        n = 60_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        # execute THIS DataFrame (a .count() would run a different
        # QueryExecution and leave j's adaptive plan unfinalized)
        rows = j.collect()

        # exact expectation: every left row matches exactly one right row
        assert len(rows) == n

        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

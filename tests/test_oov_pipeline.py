"""oov_rate semantics + training_set_pipeline composition audit."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_oov_rate_counts(spark):
    from dane_visual_feature_extraction_worker_spark.operators.textstats import (
        oov_rate,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),        # 'a' dominates the vocab
            (2, "a b c d"),        # c, d are OOV at k=2
            (3, "x y"),            # fully OOV
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab_k=2).collect()}
    # vocab = top-2 by (count desc, term asc) = {a, b}
    assert out[1]["n_oov"] == 0 and out[1]["oov_rate"] == 0.0
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 2
    assert out[2]["oov_rate"] == 0.5
    assert out[3]["n_oov"] == 2 and out[3]["oov_rate"] == 1.0


def test_training_set_pipeline_is_one_fused_plan(spark, tmp_path):
    """The composed plan must stay a single DAG with no cartesian
    products and exactly one row per purchase fact."""
    import os

    from dane_visual_feature_extraction_worker_spark.plans import driver_queries as dq

    sf = str(tmp_path)
    ev = spark.range(600).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 137 % 50_000).alias("ts"),
        (F.col("id") % 23).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit("p").alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    df = dq.QUERIES["training_set_pipeline"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    n_purch = ev.where(F.col("event_type") == "purchase").count()
    rows = df.collect()
    assert len(rows) == n_purch
    assert {r["split"] for r in rows} <= {"train", "val", "purged"}
    # rolling window is trailing: roll_n never exceeds 5
    assert all(1 <= r["roll_n"] <= 5 for r in rows)

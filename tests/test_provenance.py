from __future__ import annotations

import json

from dane_visual_feature_extraction_worker_spark.provenance import (
    ProvenanceTracker,
    stage_metrics_snapshot,
)


def test_provenance_chain_shape(tmp_path):
    tr = ProvenanceTracker("pipeline", params={"n_buckets": 4})
    with tr.step("scan", path="/x") as s:
        s.input_data = {"rows": 100}
    with tr.step("kernel"):
        pass
    rec = tr.persist(str(tmp_path / "prov.json"), output_data={"rows": 100})
    on_disk = json.loads((tmp_path / "prov.json").read_text())
    assert on_disk == rec
    assert rec["activity_name"] == "pipeline"
    assert [s["activity_name"] for s in rec["steps"]] == ["scan", "kernel"]
    assert all(s["processing_time_ms"] >= 0 for s in rec["steps"])
    assert rec["steps"][0]["input_data"] == {"rows": 100}


def test_stage_metrics_snapshot(spark, transcripts):
    transcripts.groupBy("role").count().collect()  # ensure a recent stage
    snap = stage_metrics_snapshot(spark, last_n=10)
    assert snap and "error" not in snap[0]
    keys = {
        "stage_id",
        "num_tasks",
        "shuffle_read_bytes",
        "shuffle_write_bytes",
        "memory_spill_bytes",
    }
    assert keys <= set(snap[0])


def test_observed_write_counts_without_second_scan(spark, tmp_path):
    """observed_write returns sink-pass metrics; a tick-UDF accumulator
    proves the source is materialized exactly ONCE (no read-back)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    from dane_visual_feature_extraction_worker_spark.provenance import (
        observed_write,
    )

    acc = spark.sparkContext.accumulator(0)

    def tick(x):
        acc.add(1)
        return x

    tick_udf = F.udf(tick, LongType())
    df = spark.range(500).select(tick_udf(F.col("id")).alias("id"))
    got = observed_write(
        df,
        str(tmp_path / "obs.parquet"),
        metrics=[
            F.count(F.lit(1)).alias("rows"),
            F.sum("id").alias("id_sum"),
        ],
    )
    assert got["rows"] == 500
    assert got["id_sum"] == 499 * 500 // 2
    assert acc.value == 500  # one pass: write job only, no re-read
    assert spark.read.parquet(str(tmp_path / "obs.parquet")).count() == 500

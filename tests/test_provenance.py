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

"""Provenance: per-step timed lineage records + Spark stage metrics.

Spark-native rebuild of the reference's provenance chain
(models.py:19-43 ``Provenance`` dataclass — activity name, timestamps,
duration, input/output, nested steps; persisted JSON by
provenance.py:39-42 and chained per step in
main_data_processor.py:51-61,80-104).

Two layers:
- ``ProvenanceTracker``: driver-side step timer producing the same
  nested record shape (activity, params, ms, input/output, steps),
  persisted as JSON next to the output table.
- ``stage_metrics_snapshot``: pulls rows/bytes/shuffle/spill per stage
  from Spark's AppStatusStore after a job — the distributed counters the
  reference cannot have (north rule: rows, bytes, shuffle spill).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class ProvenanceStep:
    activity: str
    params: dict = field(default_factory=dict)
    input_data: dict = field(default_factory=dict)
    output_data: dict = field(default_factory=dict)
    start_unix: float = 0.0
    ms: float = 0.0
    steps: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "activity_name": self.activity,
            "activity_params": self.params,
            "input_data": self.input_data,
            "output_data": self.output_data,
            "start_time_unix": self.start_unix,
            "processing_time_ms": self.ms,
            "steps": [s.to_dict() for s in self.steps],
        }


class ProvenanceTracker:
    """Chain of timed steps (context-manager per step)."""

    def __init__(self, activity: str, params: dict | None = None) -> None:
        self.root = ProvenanceStep(
            activity=activity, params=params or {}, start_unix=time.time()
        )
        self._t0 = time.monotonic()

    def step(self, activity: str, **params):
        tracker = self

        class _Step:
            def __enter__(self_inner):
                self_inner.rec = ProvenanceStep(
                    activity=activity, params=params, start_unix=time.time()
                )
                self_inner.t0 = time.monotonic()
                return self_inner.rec

            def __exit__(self_inner, *exc):
                self_inner.rec.ms = (time.monotonic() - self_inner.t0) * 1000.0
                tracker.root.steps.append(self_inner.rec)
                return False

        return _Step()

    def finish(self, output_data: dict | None = None) -> dict:
        self.root.ms = (time.monotonic() - self._t0) * 1000.0
        self.root.output_data = output_data or {}
        return self.root.to_dict()

    def persist(self, path: str, output_data: dict | None = None) -> dict:
        rec = self.finish(output_data)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(rec, f, indent=2, sort_keys=True)
        return rec


def stage_metrics_snapshot(spark: SparkSession, last_n: int = 20) -> list[dict]:
    """Rows/bytes/shuffle/spill per completed stage (newest first).

    Reads Spark's AppStatusStore via the JVM gateway; works in local and
    cluster mode (driver-side). Metrics: input/output rows+bytes, shuffle
    read/write bytes, memory/disk spill — the counters the north rule
    asks for per partition-of-work."""
    import json as _json
    import urllib.request

    out: list[dict] = []
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages", timeout=10
        ) as r:
            stages = _json.load(r)
        for s in stages[:last_n]:
            out.append(
                {
                    "stage_id": s.get("stageId"),
                    "name": (s.get("name") or "")[:80],
                    "status": s.get("status"),
                    "num_tasks": s.get("numTasks"),
                    "input_rows": s.get("inputRecords"),
                    "input_bytes": s.get("inputBytes"),
                    "output_rows": s.get("outputRecords"),
                    "output_bytes": s.get("outputBytes"),
                    "shuffle_read_bytes": s.get("shuffleReadBytes"),
                    "shuffle_write_bytes": s.get("shuffleWriteBytes"),
                    "memory_spill_bytes": s.get("memoryBytesSpilled"),
                    "disk_spill_bytes": s.get("diskBytesSpilled"),
                }
            )
    except Exception as e:  # pragma: no cover - UI disabled or API drift
        out.append({"error": f"status API unavailable: {e}"})
    return out


def observed_write(
    df,
    path: str,
    metrics: list | None = None,
    mode: str = "overwrite",
) -> dict:
    """Parquet write with in-flight metrics via ``Observation`` — the
    sink pass itself produces (rows, ...) with ZERO extra jobs.

    The naive pattern 'write, then read back and count()' costs a full
    re-scan of everything just written — per bucket, per attempt, that
    is a second pass over the output at 100 TB. ``df.observe`` attaches
    an accumulator-backed aggregate to the existing write job instead
    (the A20 metrics analogue: reference models.py:19-43 records
    per-activity counts alongside the work, not via a second pass).
    Returns the observed metrics dict; default metric is ``rows``.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    obs = Observation()
    cols = metrics if metrics else [F.count(F.lit(1)).alias("rows")]
    df.observe(obs, *cols).write.mode(mode).parquet(path)
    return obs.get

"""Routed skew mitigation bench (r4 VERDICT item 2 "Done" criterion):
~10M-row event table, ONE user holding ~30% of rows; time the plain
one-window kernel, the always-salted kernel, and the count-routed
auto_salt kernel (operators/windows.py). Routed must be <= min(plain,
salted) within noise: the cold majority skips the block-summary join,
the hot entity escapes the single-task window.

Usage: python scripts/bench_routed.py [n_rows] [hot_share] [reps]
Appends a row to BENCH/skew_runs.jsonl.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark
    from dane_visual_feature_extraction_worker_spark.operators.windows import (
        auto_salt_prefix_features,
        prefix_features,
        salted_prefix_features,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(EngineConfig(
        app_name="bench-routed", master=f"local[{cpus}]",
        shuffle_partitions=cpus, offheap_size="48g",
        extra_conf={"spark.driver.memory": "24g",
                    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
                    "spark.local.dir": "/dev/shm/spark-local"}))

    tmp = tempfile.mkdtemp(prefix="bench_routed_", dir="/dev/shm")
    try:
        n_cold_users = 5000
        h = F.xxhash64(F.lit(11), F.col("id"))
        ev = spark.range(n_rows, numPartitions=64).select(
            F.col("id").alias("event_id"),
            # first hot_share of rows -> user 0; rest spread uniformly
            F.when(F.col("id") < int(n_rows * hot_share), F.lit(0))
            .otherwise(F.pmod(h, F.lit(n_cold_users)) + 1)
            .alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.col("id") * 300_000  # ~3.5 rows/s corpus-wide
                + F.pmod(h, F.lit(250_000))
            ).alias("ts"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("error")),
                (F.pmod(h, F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(h, F.lit(100_000)).cast("double") / 100.0).alias("value"),
            F.lpad(F.col("id").cast("string"), 12, "x").alias("props"),
        )
        src = os.path.join(tmp, "events")
        ev.write.mode("overwrite").parquet(src)
        e = spark.read.parquet(src)
        n = e.count()

        variants = {
            "plain": lambda: prefix_features(e),
            "salted": lambda: salted_prefix_features(e, block_seconds=86_400.0),
            "routed": lambda: auto_salt_prefix_features(
                e, hot_threshold=1_000_000, block_seconds=86_400.0
            ),
        }
        # warm once each, then interleave
        times = {k: [] for k in variants}
        for k, fn in variants.items():
            fn().write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for k, fn in variants.items():
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                times[k].append(round(time.monotonic() - t0, 2))
        best = {k: min(v) for k, v in times.items()}
        out = {
            "metric": "routed auto-salt kernel vs plain/salted",
            "rows": n, "hot_share": hot_share, "cpus": cpus,
            "reps": times, "best": best,
            "routed_le_min": best["routed"] <= min(best["plain"], best["salted"]) * 1.05,
            "loadavg": os.getloadavg(),
        }
        print(json.dumps(out))
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "skew_runs.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

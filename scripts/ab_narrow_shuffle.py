"""Interleaved A/B: narrow-shuffle (packed bigints) vs raw-rows-first
flagship window plan, one JVM, alternating rep-by-rep (shared-host
discipline: only interleaved same-session timings are comparable).

Usage: python scripts/ab_narrow_shuffle.py [n_convs] [avg_turns] [cpus] [reps]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark
from dane_visual_feature_extraction_worker_spark.datagen import gen_transcripts
from dane_visual_feature_extraction_worker_spark.kernel import feature_vectors_windows

n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
avg_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 50
cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
n_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4

tmp = tempfile.mkdtemp(prefix="abnarrow_", dir="/dev/shm")
try:
    spark = get_spark(EngineConfig(
        app_name="ab-narrow", master=f"local[{cpus}]",
        shuffle_partitions=cpus, offheap_size="48g",
        extra_conf={"spark.driver.memory": "24g",
                    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
                    "spark.local.dir": "/dev/shm/spark-local"}))
    src = os.path.join(tmp, "transcripts")
    gen_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns, partitions=64
        ).write.mode("overwrite").parquet(src)
    tr = spark.read.parquet(src)
    n = tr.count()

    def job(narrow: bool) -> float:
        t0 = time.monotonic()
        feature_vectors_windows(tr, narrow_shuffle=narrow).write.mode(
            "overwrite").parquet(os.path.join(tmp, "out"))
        return time.monotonic() - t0

    # warm both variants once (C2 compilation of both codegen plans)
    job(True); job(False)
    res = {"narrow": [], "raw": []}
    for i in range(n_reps):
        la = os.getloadavg()[0]
        res["narrow"].append(round(job(True), 2))
        res["raw"].append(round(job(False), 2))
        print(json.dumps({"rep": i, "loadavg": la,
                          "narrow": res["narrow"][-1],
                          "raw": res["raw"][-1]}), flush=True)
    best_n, best_r = min(res["narrow"]), min(res["raw"])
    print(json.dumps({
        "turns": n, "cpus": cpus, "reps": res,
        "best_narrow_s": best_n, "best_raw_s": best_r,
        "narrow_vs_raw": round(best_n / best_r, 3),
        "narrow_turns_per_sec": round(n / best_n),
        "raw_turns_per_sec": round(n / best_r),
    }), flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)

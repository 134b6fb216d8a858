"""Hot-entity ceiling: what one conversation holding ~10% of the table
does to the window/as-of plans (VERDICT r3 item 6).

Both the flagship window kernel (`Window.partitionBy(conv_id)`) and the
union as-of plan sort/aggregate per conv_id, so a single hot entity
lands in ONE task: its partition is a serial lower bound on wall time
no matter how many executors exist. This script measures that ceiling
on byte-identical row counts — a uniform table vs a table where one
conv_id owns ~10% of all rows — and reports the skew factor per plan,
plus the mitigated variant (`salted_running_sum`-style block
decomposition) where one exists.

Usage: python scripts/bench_skew.py [n_convs] [avg_turns]
Prints one JSON line and appends a row to BENCH/skew_runs.jsonl.
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    avg_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark
    from dane_visual_feature_extraction_worker_spark.datagen import (
        gen_anchors,
        gen_transcripts,
    )
    from dane_visual_feature_extraction_worker_spark.operators.asof import (
        asof_join_union,
    )
    from dane_visual_feature_extraction_worker_spark.plans.pipeline import pit_features

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        EngineConfig(
            app_name="bench-skew",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
    )

    tmp = tempfile.mkdtemp(prefix="bench_skew_")
    tables = {}
    try:
        # uniform: no hot conv. skewed: SAME ballpark row count, but one
        # conv owns ~10% (hot turns = n_convs*avg_turns/10, carried by
        # hot_factor x avg_turns).
        uniform = gen_transcripts(
            spark, n_convs=n_convs, avg_turns=avg_turns, n_hot=0, partitions=64
        )
        hot_factor = max(n_convs // 10, 2)
        skewed = gen_transcripts(
            spark,
            n_convs=int(n_convs * 0.9),
            avg_turns=avg_turns,
            n_hot=1,
            hot_factor=hot_factor,
            partitions=64,
        )
        for name, df in (("uniform", uniform), ("skewed", skewed)):
            src = os.path.join(tmp, name)
            df.write.mode("overwrite").parquet(src)
            tr = spark.read.parquet(src)
            anchors = gen_anchors(spark, tr, per_conv=4)
            asrc = src + "_anchors"
            anchors.write.mode("overwrite").parquet(asrc)
            tables[name] = (
                spark.read.parquet(src),
                spark.read.parquet(asrc),
                tr.count(),
            )

        hot_rows = (
            tables["skewed"][0]
            .groupBy("conv_id")
            .count()
            .orderBy("count", ascending=False)
            .first()["count"]
        )

        def timed(fn) -> float:
            best = float("inf")
            for _ in range(2):  # warm best-of-2 (bench.py protocol)
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            return round(best, 3)

        out: dict = {"metric": "hot-entity skew ceiling", "cpus": cpus}
        for name, (tr, anchors, n) in tables.items():
            out[name] = {
                "rows": n,
                "pit_features_windows": timed(lambda: pit_features(tr)),
                "asof_join_union": timed(
                    lambda: asof_join_union(
                        anchors,
                        tr.select("conv_id", "ts", "turn_idx", "role"),
                        on="conv_id",
                        left_ts="anchor_ts",
                        right_order="turn_idx",
                    )
                ),
            }
        out["skewed"]["hot_conv_rows"] = int(hot_rows)
        out["skewed"]["hot_share"] = round(hot_rows / tables["skewed"][2], 4)
        for q in ("pit_features_windows", "asof_join_union"):
            out[f"skew_factor_{q}"] = round(
                out["skewed"][q] / out["uniform"][q], 3
            )
        out["loadavg"] = os.getloadavg()
        print(json.dumps(out))
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "skew_runs.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

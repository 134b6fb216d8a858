"""Same-session A/B of the _fan scan fan-out (guide §1: measure, don't
guess): for each query, interleave fanned (A) and unfanned (B) runs in
ONE SparkSession so JVM/GC/session drift cancels, and report the best
of each arm.

Usage: python scripts/ab_fan.py q1,q2,... [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark

    spark = build_spark(cpus)
    import __spark_entry__ as ent
    from dane_visual_feature_extraction_worker_spark.plans import driver_queries as dq

    qs = ent.queries()
    out = {}
    for name in names:
        if name not in qs:
            continue
        best = {"fan": float("inf"), "nofan": float("inf")}
        for _ in range(rounds):
            for arm, off in (("fan", False), ("nofan", True)):
                dq._FAN_OFF = off
                t0 = time.monotonic()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best[arm] = min(best[arm], time.monotonic() - t0)
        dq._FAN_OFF = False
        out[name] = {k: round(v, 3) for k, v in best.items()}
        d = best["fan"] - best["nofan"]
        print(
            f"{name}: fan={best['fan']:.3f} nofan={best['nofan']:.3f} "
            f"delta={d:+.3f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Round-6 optimization micro-bench (guide §1.4): isolate named queries
with the noop sink, warm best-of-N, optionally dump .explain("formatted")
to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py q1,q2,... [--tag before] [--runs 2] [--plans]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

This file is NOT bench.py — the frozen driver harness stays untouched;
numbers from here are cited in OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark

    spark = build_spark(cpus)
    import __spark_entry__ as ent

    qs = ent.queries()
    names = [q for q in args.queries.split(",") if q in qs]
    missing = [q for q in args.queries.split(",") if q and q not in qs]
    if missing:
        print(f"WARN unknown queries: {missing}", file=sys.stderr)

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plans and args.tag:
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(REPO, "plans", "r06", f"{name}_{args.tag}.txt"),
                "w",
            ) as fh:
                fh.write(plan)
        if args.runs == 0:
            continue
        best = float("inf")
        samples = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: best={best:.3f} samples={samples}", file=sys.stderr)
    print(json.dumps({"tag": args.tag, "queries": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()

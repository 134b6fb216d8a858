"""spark-submit entrypoint: checkpointed point-in-time feature job.

Cluster usage (north rule packaging):

    scripts/build_package.sh          # -> dist/dane_feature_engine.zip
    spark-submit \
        --py-files dist/dane_feature_engine.zip \
        jobs/run_pipeline.py \
        --input  s3://bucket/transcripts/ \
        --output s3://bucket/features/ \
        --checkpoints s3://bucket/features/_checkpoints/ \
        --n-buckets 4096

The job is the distributed twin of the reference worker's
queue-callback loop (worker.py:66-90): enumerate pending buckets from
the checkpoint table, process, record lineage+metrics, resume on
restart. On a cluster, executors come from the scheduler; nothing here
is local-mode specific (``--master`` comes from spark-submit).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="transcript parquet/table path")
    ap.add_argument("--output", required=True, help="feature output root")
    ap.add_argument("--checkpoints", required=True, help="_checkpoints table root")
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--entity-col", default="conv_id")
    ap.add_argument("--session-gap-seconds", type=float, default=1800.0)
    ap.add_argument(
        "--config",
        action="append",
        default=[],
        help="engine YAML config file(s); later files override earlier "
        "(the reference's home -> base -> local layering). Validated "
        "eagerly — a malformed config fails at submit, naming the key.",
    )
    args = ap.parse_args(argv)

    # session comes from spark-submit's conf; only runtime knobs here
    spark = SparkSession.builder.appName("pit-feature-pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if args.config:
        from dane_visual_feature_extraction_worker_spark.config import load_yaml_config

        cfg = load_yaml_config(*args.config)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(cfg.arrow_batch_size),
        )
        for k, v in cfg.extra_conf.items():
            spark.conf.set(k, v)

    from dane_visual_feature_extraction_worker_spark.checkpoint import CheckpointedRunner
    from dane_visual_feature_extraction_worker_spark.plans.pipeline import pit_features

    transcripts = spark.read.parquet(args.input)
    runner = CheckpointedRunner(
        spark,
        output_dir=args.output,
        checkpoint_dir=args.checkpoints,
        n_buckets=args.n_buckets,
        entity_col=args.entity_col,
    )
    summary = runner.run(transcripts, pit_features)
    out_rows = runner.result().count()
    print(json.dumps({**summary, "output_rows": out_rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

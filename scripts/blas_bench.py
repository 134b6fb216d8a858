"""Micro-bench: JVM-fold vs BLAS-matmul brute-force cosine top-k at the
reference's own scale shape (vec_example_np.py: 100k-1M vectors).

Usage: python scripts/blas_bench.py [n_vecs] [dim]
Prints one JSON line with both timings; asserts identical top-k ids.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark  # noqa: E402
from dane_visual_feature_extraction_worker_spark.operators.similarity import (  # noqa: E402
    topk_cosine,
    topk_cosine_blas,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(
        EngineConfig(app_name="blas-bench", master="local[32]", shuffle_partitions=32)
    )
    # bigger Arrow batches for the matmul path (kernel default 256 is
    # tuned for the transcript kernels, not for BLAS)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    import pyspark.sql.functions as F

    # deterministic pseudo-random vectors, generated distributed (no
    # driver-side numpy table): v[d] = fract(sin-free integer hash)
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(10_000)) / 5_000.0 - 1.0
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    emb.count()
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))

    def run(fn, tag):
        t0 = time.monotonic()
        rows = fn(emb, q, k=10).collect()
        return time.monotonic() - t0, [r["vec_id"] for r in rows]

    fold_s, fold_ids = run(topk_cosine, "fold")
    blas_s, blas_ids = run(topk_cosine_blas, "blas")
    # warm reps (exclude first-call JIT / python worker spin-up)
    fold_s, _ = run(topk_cosine, "fold")
    blas_s, _ = run(topk_cosine_blas, "blas")
    assert fold_ids == blas_ids, (fold_ids, blas_ids)
    print(
        json.dumps(
            {
                "n_vecs": n,
                "dim": dim,
                "jvm_fold_sec": round(fold_s, 3),
                "blas_sec": round(blas_s, 3),
                "speedup": round(fold_s / blas_s, 2),
                "topk_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()

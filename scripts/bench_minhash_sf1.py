"""Production-shape MinHash config at sf1 (r4 VERDICT item 6):
128 permutations / 16 bands of 8 over the sf1 documents table, feeding
connected-components clustering. max_iters=4 doubles as the round-count
assertion — banded near-dup components are near-cliques, so min-label
propagation must converge in single-digit rounds or something is wrong
with the banding.

Usage: python scripts/bench_minhash_sf1.py [sf_dir] [n_hashes] [band_size]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    n_hashes = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    band_size = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import pyspark.sql.functions as F

    from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark
    from dane_visual_feature_extraction_worker_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(EngineConfig(
        app_name="minhash-sf1", master=f"local[{cpus}]",
        shuffle_partitions=cpus))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(
        docs, n_hashes=n_hashes, band_size=band_size
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.monotonic() - t0

    t0 = time.monotonic()
    clusters = connected_components(
        pairs, docs.select("doc_id"), max_iters=4
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    n_moved = clusters.where(F.col("doc_id") != F.col("cluster_id")).count()
    t_cc = time.monotonic() - t0
    pairs.unpersist()

    out = {
        "metric": f"minhash {n_hashes}/{n_hashes // band_size}bands + CC at sf1",
        "docs": n_docs, "pairs": n_pairs,
        "clusters": n_clusters, "non_rep_members": n_moved,
        "pairs_sec": round(t_pairs, 2), "cc_sec": round(t_cc, 2),
        "cc_rounds_le": 4, "cpus": cpus,
        "loadavg": os.getloadavg(),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "skew_runs.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()

"""Deterministic testdata upscaler: build an sfK dir from an existing
sf dir by replicating each table with shifted ids.

Usage: python scripts/gen_sf.py SRC_DIR OUT_DIR FACTOR

Scaling model: entity COUNT scales with the factor (new user_ids /
doc_ids / vec_ids per replica), per-entity cardinality stays constant —
the way a production corpus grows. Replica 0 is byte-identical to the
source; replicas r >= 1 shift ids by r * ID_STRIDE and perturb payloads
deterministically (text gets a replica suffix token, embeddings get a
component-wise (1 + r/1000) rescale) so dedup/ANN queries see realistic
near-but-not-exact distributions instead of 10x exact duplicates.

Only the tables the bench headline touches are scaled (events,
documents, embeddings); the TPC-H-ish tables are not used by bench.
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

ID_STRIDE = 10_000_000_000


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from dane_visual_feature_extraction_worker_spark import EngineConfig, get_spark

    spark = get_spark(
        EngineConfig(app_name="gen-sf", master="local[32]", shuffle_partitions=32)
    )
    os.makedirs(out, exist_ok=True)

    def replicas(df, id_cols: dict[str, str], perturb=None):
        parts = []
        for r in range(factor):
            d = df
            for col in id_cols:
                d = d.withColumn(col, F.col(col) + F.lit(r * ID_STRIDE))
            if perturb is not None and r > 0:
                d = perturb(d, r)
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    ev = spark.read.parquet(f"{src}/events.parquet")
    replicas(ev, {"event_id": "", "user_id": ""}).repartition(64).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    replicas(
        docs,
        {"doc_id": ""},
        perturb=lambda d, r: d.withColumn(
            "text", F.concat_ws(" ", F.col("text"), F.lit(f"rep{r}"))
        ).withColumn("n_chars", F.length("text").cast("bigint")),
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    replicas(
        emb,
        {"vec_id": ""},
        perturb=lambda d, r: d.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x: (x * (1.0 + r / 1000.0)).cast("float"),
            ),
        ),
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in ["events", "documents", "embeddings"]:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

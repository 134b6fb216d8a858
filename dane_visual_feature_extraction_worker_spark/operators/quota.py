"""Per-entity quota sampling (domain caps).

Web-scale corpora are dominated by a few hot entities (domains,
sources, crawl hosts); pre-training pipelines cap documents per entity
so no single one dominates the mixture. The naive plan — row_number()
over PARTITION BY entity and keep rank <= cap — shuffles and sorts the
ENTIRE corpus, and the hot entity's sort runs in one task. This module
implements the 100 TB shape instead:

1. one map-side-combined count rollup (entity, n) — the shuffle carries
   per-partition partials, never rows;
2. the over-cap ("hot") entity list is at most corpus_rows / cap
   entries — broadcast it;
3. rows of under-cap entities pass through NARROW — no shuffle, no
   sort, they are all keepers by definition;
4. hot-entity rows are first PRE-FILTERED by a deterministic md5 key
   threshold (keys are uniform in [0, 2^32), so key <
   margin*cap/n * 2^32 keeps ~margin*cap of n rows — a Chernoff bound
   puts "fewer than cap survive" at e^-Θ(cap·margin) for margin >= 2,
   vanishing for the default margin 8), THEN ranked. The per-entity
   sort input is ~margin*cap rows regardless of how hot the entity is,
   so the skewed-sort floor that motivated salted_prefix_features
   (operators/windows.py) never forms.

Selection itself is deterministic and engine-portable: rank by
``sample_key(id)`` (md5 — operators/sampling.py) with the id as
tie-break, so the kept set is a pure function of the data — stable
across runs, partition layouts, and engines, and a DuckDB oracle can
replay it digit for digit.

``validate_quota`` returns the (should-be-empty) set of entities whose
kept count disagrees with min(cap, n) — run it when margin was chosen
aggressively.

Reference provenance: the reference processes one source_id per queue
message (worker.py:66-90) and has no corpus-level rebalancing; this is
part of the corpus-scale operator surface the 100 TB engine adds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.operators.sampling import (
    SAMPLE_SPACE,
    sample_key,
)


def quota_sample(
    df: DataFrame,
    entity_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "quota",
    prefilter_margin: float = 8.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per entity, chosen deterministically
    by md5 key. Under-cap entities pass through narrow (no shuffle);
    over-cap entities are key-prefiltered to ~margin*cap rows before
    the per-entity rank. Output columns = input columns."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if prefilter_margin < 2.0:
        raise ValueError(
            f"prefilter_margin < 2 risks dropping keepers, got {prefilter_margin}"
        )
    ent = F.col(entity_col)
    counts = df.groupBy(entity_col).agg(F.count(F.lit(1)).alias("__n"))
    hot = counts.where(F.col("__n") > cap)

    key = sample_key(F.col(id_col), salt)
    tagged = df.join(F.broadcast(hot), on=entity_col, how="left")
    cold = tagged.where(F.col("__n").isNull()).drop("__n")

    # key < margin*cap/n * 2^32  (ceil; clamped to the full key space)
    thr = F.least(
        F.lit(SAMPLE_SPACE),
        F.ceil(F.lit(float(prefilter_margin * cap) * SAMPLE_SPACE) / F.col("__n")),
    )
    survivors = tagged.where(F.col("__n").isNotNull() & (key < thr)).drop("__n")
    w = Window.partitionBy(ent).orderBy(key.asc(), F.col(id_col).asc())
    hot_kept = (
        survivors.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )
    return cold.unionByName(hot_kept)


def validate_quota(
    original: DataFrame,
    sampled: DataFrame,
    entity_col: str,
    cap: int,
) -> DataFrame:
    """Entities where kept != min(cap, n) — empty iff the prefilter
    margin was safe. Join is on the (small) entity rollups."""
    want = original.groupBy(entity_col).agg(
        F.least(F.count(F.lit(1)), F.lit(cap)).alias("want")
    )
    got = sampled.groupBy(entity_col).agg(F.count(F.lit(1)).alias("got"))
    return (
        want.join(got, on=entity_col, how="left")
        .where(F.coalesce(F.col("got"), F.lit(0)) != F.col("want"))
        .select(entity_col, "want", "got")
    )

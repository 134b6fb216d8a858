"""Snapshot merge / CDC upsert: latest-version-wins per key.

The 100 TB transcript and document tables are maintained by MERGE
semantics (Iceberg ``MERGE INTO``): a base snapshot plus a stream of
upserts (new keys and newer versions of existing keys), merged so the
highest version per key wins. This module is the engine-side
implementation for when the catalog isn't doing it for us (plain
parquet snapshots, backfill reconciliation, unit tests).

Plan: ``unionByName`` the snapshots (narrow), then ONE hash aggregation
``max_by(struct(payload), version)`` keyed on the merge key. max_by is
an algebraic aggregate, so the shuffle carries one partially-combined
candidate row per (partition, key) — never both versions — and there is
no sort anywhere (the window row_number formulation would sort every
group; arg-max doesn't need to). Ties must not exist: version is
required unique per key (enforce upstream — e.g. commit LSN); the
deterministic tie-break ``greatest`` on the struct would otherwise
depend on column order, so we raise that contract in the docstring
rather than hide it.

At scale: one uniform-key shuffle over base+updates; with the base
bucketed/sorted by key (Iceberg bucket transform), AQE or a storage-
partitioned join turns this into a merge-on-read-shaped local
aggregation. Updates are typically << base, but max_by costs the same
either way and never broadcasts the big side.

Reference provenance: the reference overwrites per-source_id outputs
wholesale on reprocessing (worker.py download→extract→transfer loop);
keyed upsert is the corpus-scale generalization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    version_col: str,
) -> DataFrame:
    """Latest-version-wins merge of two snapshots with identical
    schemas. ``version_col`` must be unique per key across both inputs
    (e.g. a commit sequence number) — equal versions for one key make
    the winner undefined. Output columns = input columns."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} "
            f"vs updates {sorted(updates.columns)}"
        )
    payload = [c for c in base.columns if c != key_col]
    both = base.unionByName(updates)
    merged = both.groupBy(key_col).agg(
        F.max_by(F.struct(*payload), F.col(version_col)).alias("__row")
    )
    return merged.select(key_col, *[F.col(f"__row.{c}").alias(c) for c in payload])

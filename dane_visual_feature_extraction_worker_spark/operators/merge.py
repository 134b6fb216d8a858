"""Snapshot merge / CDC upsert: latest-version-wins per key.

The 100 TB transcript and document tables are maintained by MERGE
semantics (Iceberg ``MERGE INTO``): a base snapshot plus a stream of
upserts (new keys and newer versions of existing keys), merged so the
highest version per key wins. This module is the engine-side
implementation for when the catalog isn't doing it for us (plain
parquet snapshots, backfill reconciliation, unit tests).

Plan: ``unionByName`` the snapshots (narrow), then ONE partial+final
aggregation ``max_by(struct(payload), version)`` keyed on the merge
key around a single exchange. max_by is algebraic, so the shuffle
carries one partially-combined candidate row per (partition, key) —
never both versions. Physically Spark runs it as SortAggregate
(struct-typed aggregation buffers aren't hash-aggregable), i.e. a
per-partition sort on the MERGE KEY — still strictly cheaper than the
window ``row_number`` formulation, which would shuffle and sort every
version of every row and keep them all through the exchange; the
max_by shuffle moves one candidate per partition-key. Ties must not
exist: version is
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots — the CDC emitter
    (Iceberg ``changelog`` semantics run engine-side, the write-side
    twin of ``merge_upsert``): every key is classified ``insert``
    (new only), ``delete`` (old only), ``update`` (both, any compared
    column differs), or dropped (both, identical).

    Plan: ONE full-outer sort-merge join on the key, then a pure
    column comparison — no window, no second pass; change detection
    is md5 over the null-tagged concat of the compared columns, so
    wide rows compare as one digest. Both sides hash-cluster on the
    (assumed near-unique) key; at 100 TB bucket both snapshots on the
    key and the join is zero-shuffle.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key_col]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols absent from a side: {missing}")

    def digest(side: DataFrame, alias: str) -> DataFrame:
        # null-tagged concat: (NULL, 'a') and ('a', NULL) must differ
        parts = []
        for c in compare_cols:
            parts.append(
                F.when(F.col(c).isNull(), F.lit("\x00n")).otherwise(
                    F.concat(F.lit("\x00v"), F.col(c).cast("string"))
                )
            )
        return side.select(
            F.col(key_col), F.md5(F.concat(*parts)).alias(alias)
        )

    o = digest(old, "__old_d")
    n = digest(new, "__new_d")
    j = o.join(n, key_col, "full_outer")
    change = (
        F.when(F.col("__old_d").isNull(), F.lit("insert"))
        .when(F.col("__new_d").isNull(), F.lit("delete"))
        .when(F.col("__old_d") != F.col("__new_d"), F.lit("update"))
    )
    return (
        j.select(F.col(key_col), change.alias("change"))
        .where(F.col("change").isNotNull())
    )


def time_travel_read(
    log: DataFrame,
    key_col: str,
    version_col: str,
    op_col: str,
    as_of,
) -> DataFrame:
    """Materialize table state AS OF ``version <= as_of`` from an
    append-only CDC log with upserts and tombstones — the Iceberg/Delta
    time-travel read implemented over plain parquet: per key, the
    latest op at-or-before the cut wins; keys whose latest op is a
    delete ('D' in ``op_col``) are absent from the snapshot.

    ``as_of`` may be a literal version, or a ONE-ROW DataFrame with an
    ``as_of`` column (e.g. a scalar aggregate like "70% of max seq") —
    the frame is broadcast-crossJoined so the whole read stays lazy,
    no driver round-trip.

    Plan: a literal version filter is a pushed predicate (on a
    version-partitioned log it prunes partitions — reading a snapshot
    near version V scans only files up to V; the DataFrame form
    evaluates post-scan, the price of laziness); then ONE
    map-side-combined ``max_by(struct(payload), version)`` aggregate —
    the exchange carries one candidate row per (partition, key), never
    the history. Tombstones filter AFTER the agg: a delete must be able
    to win (and suppress the key), not be pre-filtered away.
    """
    payload = [c for c in log.columns if c != key_col]
    if isinstance(as_of, DataFrame):
        snap = log.crossJoin(F.broadcast(as_of)).where(
            F.col(version_col) <= F.col("as_of")
        )
    else:
        snap = log.where(F.col(version_col) <= F.lit(as_of))
    latest = snap.groupBy(key_col).agg(
        F.max_by(F.struct(*payload), F.col(version_col)).alias("__r")
    )
    return latest.where(F.col(f"__r.{op_col}") != "D").select(
        key_col, *[F.col(f"__r.{c}").alias(c) for c in payload]
    )

"""Slowly-changing-dimension type-2 history: build + point-in-time read.

The feature-store companion to the as-of family: where an as-of join
answers "latest observation at or before t", an SCD2 dimension stores
each entity's attribute HISTORY as non-overlapping validity intervals
``[valid_from, valid_to)`` (``valid_to`` NULL = current row), so any
fact can be enriched with the attribute value that was true WHEN THE
FACT HAPPENED — the canonical leakage-free dimension join for training
data (reference precedent: the worker stamps each extraction with the
model/config provenance in force at processing time,
feature_extraction.py provenance record; SCD2 is that idea turned into
a queryable table).

Scale shape: ``scd2_build`` is ONE hash exchange on the entity key +
one sort, both window passes (change detection, interval close) riding
the same sorted run — the flagship kernel's plan class, so the same
skew routing applies. ``scd2_lookup`` deliberately does NOT compile to
an interval/range join (``fact.ts BETWEEN valid_from AND valid_to``
explodes into O(|facts| x |versions|) candidate pairs under a generic
theta join): because SCD2 intervals TILE time per entity, "the interval
containing t" is exactly "the latest version_start <= t", so the lookup
IS the union-window as-of join — one shuffle, no range-join blow-up at
10^12 facts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dane_visual_feature_extraction_worker_spark.operators.asof import (
    asof_join_union,
)


def scd2_build(
    changes: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Collapse a change-event log into SCD2 validity intervals.

    Per entity, ordered by ``(ts, order_col)``: a row OPENS a new
    version iff any attribute differs from the previous event's (null-
    safe compare; the first event always opens). Each version's
    ``valid_to`` is the next version's ``valid_from`` (NULL for the
    current version). No-op change events (same attributes re-stated)
    are absorbed into the open version — the dimension stores versions,
    not events.

    Exactly-one-exchange plan: change detection (``lag`` over the
    event order) and interval close (``lead`` over the surviving
    version rows) both partition on the entity key, so Catalyst plans
    ONE hash exchange + one sort and the second window reuses the
    sorted run. Ties on ``ts`` are ordered by ``order_col`` so the
    build is deterministic under any physical layout.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    opens = (
        changes.select(entity_col, ts_col, order_col, *attr_cols)
        .withColumn("__new", changed | F.lag(ts_col).over(w).isNull())
        .where(F.col("__new"))
        .drop("__new")
    )
    wv = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    return (
        opens.withColumn("valid_to", F.lead(ts_col).over(wv))
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn(
            "version",
            F.row_number().over(
                Window.partitionBy(entity_col).orderBy(
                    "valid_from", order_col
                )
            ),
        )
        .drop(order_col)
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    entity_col: str,
    fact_ts: str,
) -> DataFrame:
    """Point-in-time dimension read: each fact picks the dim version
    whose ``[valid_from, valid_to)`` contains ``fact_ts``.

    Because versions tile time per entity, this is the as-of join on
    ``valid_from`` (latest version start <= fact ts) — facts before an
    entity's first version get NULL attributes, exactly the interval
    semantics. Compiles to the flagship union-window plan: ONE shuffle
    on the entity key, zero range-join candidate blow-up; a fact
    landing at a version boundary (``fact_ts == valid_from``) reads the
    NEW version, matching the half-open interval.
    """
    return asof_join_union(
        facts,
        dim.withColumnRenamed("valid_from", "__vts"),
        on=entity_col,
        left_ts=fact_ts,
        right_ts="__vts",
        right_order="version",
    )

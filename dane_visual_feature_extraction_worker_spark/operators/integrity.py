"""Per-entity ordered-content digests — the text-equality certificate.

The north rule requires "per-turn text equality under stable
(conv_id, turn_idx) ordering" (BASELINE.json input_hint; the reference
asserts its analogue by slicing the output matrix positionally against
golden rows, tests/unit/feature_extraction_test.py:56-60). An
order-SENSITIVE digest per conversation certifies both halves at once:
two engines produce the same digest iff every turn's payload matches
at the same position in the stable ordering. One digest row per entity
makes the certificate O(|entities|) to store/compare — the practical
way to diff two 100 TB corpus copies.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: ASCII unit separator — cannot appear in the digested payload
#: rendering, so concatenation is injective.
_SEP = "\x1f"


def ordered_digest(
    df: DataFrame,
    entity: str = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
    payload: Column | None = None,
) -> DataFrame:
    """md5 over the entity's payloads in stable ``order`` + turn count.

    Plan: ONE map-side-combinable aggregation (collect_list runs in
    ObjectHashAggregate with partial merge) — the shuffle carries
    per-partition partial lists, and ``sort_array`` over the
    (order..., payload) struct re-establishes the stable global order
    AFTER the merge, so the digest is independent of partition layout
    and merge order. No window, no global sort. Memory note for
    100 TB: the aggregation buffers one entity's history per group —
    conversations are bounded (10^3-10^5 turns), which is exactly the
    reference's own per-file working set (it loads one entity's
    keyframe list in memory, data_handling.py:30-33); for unbounded
    entities digest in time-blocks and chain the block digests.
    """
    if payload is None:
        payload = F.concat_ws(
            "|", F.col("event_id").cast("string"), F.col("event_type")
        )
    ordered = F.sort_array(
        F.collect_list(F.struct(*[F.col(c) for c in order], payload.alias("__p")))
    )
    return (
        df.groupBy(entity)
        .agg(ordered.alias("__xs"))
        .select(
            entity,
            F.size("__xs").alias("n_turns"),
            F.md5(
                F.concat_ws(_SEP, F.transform("__xs", lambda x: x["__p"]))
            ).alias("digest"),
        )
    )

"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference worker keeps per-entity progress in its job loop
(worker.py:66-90: one entity processed at a time, results registered
incrementally). The streaming analogue is an explicit per-entity state
store: ``running_totals`` maintains (n_turns, chars_total, last_ts)
per entity ACROSS micro-batches — the state survives between triggers
via the state store, so a restart resumes counting rather than
recomputing (exactly the checkpoint/resume contract, streaming form).

Arrow-vectorized: each group's rows arrive as pandas frames; state is
one tuple per entity. GroupStateTimeout is off — totals are cumulative
forever (bound state by entity cardinality; at 100 TB key state lives
in the state store backed by HDFS/object-store checkpoints).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n bigint, chars bigint, last_us bigint"
OUTPUT_SCHEMA = (
    "entity string, n_turns bigint, chars_total bigint, last_ts timestamp"
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, chars, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        chars += int(pdf["__chars"].sum())
        ts_us = pdf["__ts"].astype("datetime64[us]").astype("int64")
        if len(ts_us):
            last_us = max(last_us, int(ts_us.max()))
    state.update((n, chars, last_us))
    yield pd.DataFrame(
        {
            "entity": [key[0]],
            "n_turns": [n],
            "chars_total": [chars],
            "last_ts": pd.Series([last_us]).astype("datetime64[us]"),
        }
    )


def running_totals(
    stream: DataFrame,
    entity: str = "conv_id",
    ts: str = "ts",
    text: str = "text",
) -> DataFrame:
    """Per-entity running totals with explicit cross-batch state."""
    prepared = stream.select(
        F.col(entity).cast("string").alias("__e"),
        F.col(ts).cast("timestamp").alias("__ts"),
        F.length(F.coalesce(F.col(text), F.lit(""))).cast("long").alias("__chars"),
    )
    return prepared.groupBy("__e").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Single-process pandas reference extractor — the trusted oracle.

The analogue of the reference worker itself: a plain, eager,
one-entity-at-a-time implementation of every engine operator, written
with none of the engine's code paths (pandas groupby loops instead of
Spark). Golden fixtures and property tests compare the engine against
this (mirroring tests/unit/feature_extraction_test.py:33-62: exact on
keys, allclose on float features).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SESSION_GAP_S = 1800.0


def sort_transcripts(t: pd.DataFrame) -> pd.DataFrame:
    return t.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def asof_join_ref(
    left: pd.DataFrame,
    right: pd.DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_order: str,
) -> pd.DataFrame:
    """Brute-force nested-loop as-of join (O(n*m) per entity)."""
    out_rows = []
    r_by_key = dict(tuple(right.groupby(on)))
    r_extra = [c for c in right.columns if c not in (on, right_ts)]
    for _, lrow in left.iterrows():
        cand = r_by_key.get(lrow[on])
        match = None
        if cand is not None:
            ok = cand[cand[right_ts] <= lrow[left_ts]]
            if len(ok):
                mx = ok[ok[right_ts] == ok[right_ts].max()]
                match = mx.sort_values(right_order).iloc[-1]
        row = dict(lrow)
        row["matched_ts"] = match[right_ts] if match is not None else pd.NaT
        for c in r_extra:
            row[c] = match[c] if match is not None else None
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def sessionize_ref(t: pd.DataFrame, gap_s: float = SESSION_GAP_S) -> pd.DataFrame:
    """Per-conv gap sessionization, O(n) scan."""
    t = sort_transcripts(t)
    out = []
    for _conv, g in t.groupby("conv_id", sort=True):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy() / 1e6
        sess = np.zeros(len(g), dtype=np.int64)
        cur = 0
        for i in range(1, len(g)):
            if ts[i] - ts[i - 1] > gap_s:
                cur += 1
            sess[i] = cur
        gg = g.copy()
        gg["session_id"] = sess
        out.append(gg)
    return pd.concat(out).reset_index(drop=True)


def features_ref(t: pd.DataFrame) -> pd.DataFrame:
    """Golden feature vectors: deliberately reuses the kernel's pure-
    pandas math (engine code path = applyInPandas wrapper around the
    same function, so this checks the *distributed execution*, while
    kernel-math correctness is pinned separately by hand-computed cases
    in test_kernel.py)."""
    from dane_visual_feature_extraction_worker_spark.kernel import compute_features_pd

    out = [compute_features_pd(g) for _, g in t.groupby("conv_id", sort=True)]
    return pd.concat(out).reset_index(drop=True)

from __future__ import annotations

import pandas as pd

from dane_visual_feature_extraction_worker_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from tests.reference_impl import sessionize_ref


def test_sessionize_matches_reference(transcripts, transcripts_pd):
    got = (
        sessionize(transcripts, gap_seconds=1800.0, order=["ts", "turn_idx"])
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = sessionize_ref(transcripts_pd, gap_s=1800.0)[
        ["conv_id", "turn_idx", "session_id"]
    ].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_session_stats_counts(transcripts, transcripts_pd):
    got = session_stats(transcripts, 1800.0, order=["ts", "turn_idx"]).toPandas()
    ref = sessionize_ref(transcripts_pd, 1800.0)
    ref_stats = (
        ref.groupby(["conv_id", "session_id"])
        .agg(n_turns=("turn_idx", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
        .reset_index()
    )
    assert len(got) == len(ref_stats)
    g = got.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    r = ref_stats.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    assert (g["n_turns"].to_numpy() == r["n_turns"].to_numpy()).all()

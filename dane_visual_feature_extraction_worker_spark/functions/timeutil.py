"""Timestamp helpers — one blessed epoch-seconds conversion.

Parquet timestamps read as TIMESTAMP_NTZ in Spark 4, which cannot cast
to double directly; route through TIMESTAMP (session tz — the engine
pins UTC at session build / tune_for_session). All engine time math is
difference-based, so even a non-UTC session stays correct within a DST
period; pinning UTC removes the caveat entirely.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (double, microsecond fraction) from any timestamp."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")


def ts_seconds_pd(s: pd.Series) -> "pd.Series":
    """Pandas-side epoch seconds: normalize ns/us units before int64."""
    return s.astype("datetime64[us]").astype("int64") / 1e6


def round_half_away(x, decimals: int = 6):
    """SQL-compatible ROUND (half away from zero). ``np.round`` is
    half-to-even, which disagrees with Spark/DuckDB ROUND exactly at
    ties — this matches them so kernel outputs value-hash clean."""
    import numpy as np

    m = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m
